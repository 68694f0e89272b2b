"""Is the big-table scatter's cost a consumer-scheduling artifact?
Probe: scan carrying T=[200k,769] (the scaled ACF item table); variants
differ in how many gather-consumers T has before the scatter.  Measured
(SPEED.md round 3): 13.1 / 13.1 / 16.5 ms per step for 1/2/3 gathers -
the scatter cost is FLAT in consumer count; large-table scatter cost
tracks touched bytes, and the ACF step's row traffic is semantically
required (LazyAdam updates every row that received a gradient).
Run on the real chip:  python scripts/scatter_inplace_probe.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

R, C = 200_000, 769
B, E = 16_384, 163_840
S = 180_224
key = jax.random.PRNGKey(0)
T0 = jax.random.normal(key, (R, C))
idsA = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, R)
idsB = jax.random.randint(jax.random.fold_in(key, 2), (E,), 0, R)
idsC = jnp.asarray(
    np.random.default_rng(0).permutation(R)[:S].astype(np.int32)
)
STEPS = 20


def run(variant):
    @jax.jit
    def prog(T):
        def body(T, i):
            iA = (idsA + i) % R
            iC = (idsC + i) % R
            acc = jnp.float32(0)
            gA = jnp.take(T, iA, axis=0)
            acc += gA[0, 0]
            if variant in ("three_gathers",):
                gB = jnp.take(T, (idsB + i) % R, axis=0)
                acc += gB[0, 0]
            if variant in ("three_gathers", "two_gathers"):
                g3 = jnp.take(T, iC, axis=0)
            else:  # reuse: the apply consumes rows derived w/o re-gather
                g3 = jnp.take(T, iC, axis=0)  # still needed for the update
            new = g3 * 0.999 + 0.001 * acc
            return T.at[iC].set(new, unique_indices=True), None

        out, _ = jax.lax.scan(body, T, jnp.arange(STEPS, dtype=jnp.int32))
        return out[0, 0]

    _ = float(prog(T0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(prog(T0))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


for v in ("one_gather", "two_gathers", "three_gathers"):
    print(v, f"{run(v):.2f} ms/step", flush=True)
