"""Does avoiding the dense-gradient materialization speed the TF-parity
Adam table update?  (a) = current: g = scatter(zeros); m = b1*m + (1-b1)*g.
(b) = scaled-scatter-into-swept-m: m = (b1*m).at[ids].add((1-b1)*vals).
Chained in a scan, one fetch (headline geometry: [10k,64], 512 rows/step).
Measured (SPEED.md round 3): (a) 49.6 vs (b) 57.8 us/step - the dense
materialization XLA already emits WINS; kept as the documented negative.
Run on the real chip:  python scripts/adam_fuse_bench.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

U, K, B = 10_000, 64, 512
STEPS = 703
key = jax.random.PRNGKey(0)
m = jax.random.normal(key, (U, K))
v = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (U, K)))
p = jax.random.normal(jax.random.fold_in(key, 2), (U, K))
ids = jax.random.randint(jax.random.fold_in(key, 3), (B,), 0, U)
vals = jax.random.normal(jax.random.fold_in(key, 4), (B, K))
b1, b2, lr, eps = 0.9, 0.999, 0.001, 1e-7


def upd(mvp, g, t):
    m, v, p = mvp
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    mh = m / (1 - b1 ** t)
    vh = v / (1 - b2 ** t)
    return (m, v, p - lr * mh / (jnp.sqrt(vh) + eps))


@jax.jit
def run_a(m, v, p, ids, vals):
    def body(carry, i):
        m, v, p = carry
        g = jnp.zeros((U, K)).at[(ids + i) % U].add(vals)
        return upd((m, v, p), g, 1.0 + i.astype(jnp.float32)), None

    out, _ = jax.lax.scan(
        body, (m, v, p), jnp.arange(STEPS, dtype=jnp.int32)
    )
    return out[2][0, 0]


@jax.jit
def run_b(m, v, p, ids, vals):
    def body(carry, i):
        m, v, p = carry
        ii = (ids + i) % U
        m = (b1 * m).at[ii].add((1 - b1) * vals)
        v = (b2 * v).at[ii].add((1 - b2) * vals * vals)
        t = 1.0 + i.astype(jnp.float32)
        mh = m / (1 - b1 ** t)
        vh = v / (1 - b2 ** t)
        return (m, v, p - lr * mh / (jnp.sqrt(vh) + eps)), None

    out, _ = jax.lax.scan(
        body, (m, v, p), jnp.arange(STEPS, dtype=jnp.int32)
    )
    return out[2][0, 0]


for name, fn in (("a_dense_g", run_a), ("b_fused_scatter", run_b)):
    _ = float(fn(m, v, p, ids, vals))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        x = float(fn(m, v, p, ids, vals))
        best = min(best, time.perf_counter() - t0)
    print(name, f"{best*1e3:.2f} ms/epoch  {best/STEPS*1e6:.2f} us/step",
          flush=True)
