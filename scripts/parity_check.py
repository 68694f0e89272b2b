"""Accuracy-parity harness (BASELINE.md acceptance criterion 1).

The reference's TF 2.3.1 stack cannot be installed in this image, so parity
is checked against a faithful torch-CPU re-implementation of the reference
training semantics (same loss with its quirks, same Adam config, same
epoch/negative-sampling scheme, same evaluator protocol via our oracle-
tested metrics): both stacks train on the SAME dataset/features and must
converge to the same recall@20 / AUC / NDCG@20 within run-to-run variance.

Covered recs (reference files mirrored):
- bprmf         BPRMF.py:87-125  (clip(-80,1e8), neg-bias reg/10)
- vbpr          VBPR.py:99-144   (frozen F, whole-matrix E/Bp reg, reg/10)
- grad_fashion  GradFashion.py:136-193 (two families, NO /10, whole-matrix
                Ec/Ee/E/Bp reg)
- attentive_fashion  AttentiveFashion.py:209-256 (3 trainable encoders w/
                Dropout(0.5), user-gated modality attention, reg on encoder
                OUTPUT activations + attention matrices, no item bias)
- comp_vbpr     CompVBPR.py:105-311 (4 families: 3 frozen projections +
                trainable AlexNet edge tower; neg-bias reg/10; whole-matrix
                E*/Bp* + CNN non-bias reg)
- acf           ACF.py:135-264.  NOTE the reference detaches the attentive
                user profile from the tape (`tf.Variable(np.asarray(...))`,
                ACF.py:205-211): gradients reach ONLY Gi through the score;
                Gu/Pi/attention weights receive reg-decay only.  This
                framework deliberately trains end-to-end (the paper's
                semantics), so parity for acf is measured against the
                end-to-end torch reference (--acf_semantics endtoend,
                default); --acf_semantics as_shipped reproduces the
                reference artifact for the record.

Run:  python scripts/parity_check.py [--rec vbpr] [--epochs 40]
Emits one JSON line with both metric sets and the deltas.
"""

import argparse
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torch (CPU) plays the reference stack; it ships in this image but is NOT a
# framework dependency — fail with a clear message rather than a stacktrace.
try:
    import torch  # noqa: F401
except ImportError:  # pragma: no cover
    sys.exit(
        "parity_check.py needs torch (CPU) to emulate the reference "
        "training semantics; it is not a fashionvisualexpl_tpu dependency. "
        "Install torch or run on an image that bundles it."
    )

if os.environ.get("PARITY_CPU", "1") == "1":
    # parity runs fine on CPU; the axon sitecustomize overrides JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", "cpu")


def _glorot(*shape):
    limit = np.sqrt(6.0 / (shape[0] + shape[-1]))
    return (torch.rand(*shape) * 2 * limit - limit).requires_grad_()


def make_features(data, seed=0, signal=0.0):
    """Synthetic frozen feature families shared verbatim by both stacks
    (maxabs-normalized like visual_loader_mixin.py:22-31).

    ``signal`` blends an item co-occurrence embedding (SVD of the centered
    train matrix) into the dense families / edge images / class labels.
    At 0 the features are pure noise — a model whose ONLY item pathway is
    multiplicatively gated by the features (attentive_fashion) cannot
    generalize there and drifts BELOW-random AUC as uniform negative
    sampling pushes each user's held-out positive down (measured: AUC
    0.42 @ 10 epochs -> 0.14 @ 40 — in BOTH stacks).  Real catalogs carry
    feature signal; signal>0 restores a learnable regime so converged
    parity is measured where the model actually learns."""
    rng = np.random.default_rng(seed + 100)
    I = data.num_items

    def maxabs(x):
        return (x / max(np.abs(x).max(), 1e-12)).astype(np.float32)

    emb = None
    if signal > 0:
        M = np.zeros((data.num_users, I), np.float64)
        for u, row in enumerate(data.training_list):
            M[u, row] = 1.0
        _, sv, vt = np.linalg.svd(M - M.mean(axis=0), full_matrices=False)
        rank = 16
        emb = vt[:rank].T * sv[:rank]  # [I, rank]
        emb = (emb / max(np.abs(emb).max(), 1e-12)).astype(np.float32)

    def dense(x):
        if emb is None:
            return maxabs(x)
        k = min(x.shape[1], emb.shape[1])
        x = (1.0 - signal) * x / max(np.abs(x).max(), 1e-12)
        x[:, :k] += signal * emb[:, :k]
        return maxabs(x)

    onehot = np.zeros((I, 10), np.float32)
    if emb is None:
        classes = rng.integers(0, 10, size=I)
    else:
        # class label = co-occurrence leading-direction decile
        classes = np.searchsorted(
            np.quantile(emb[:, 0], np.linspace(0, 1, 11)[1:-1]), emb[:, 0]
        )
    onehot[np.arange(I), classes] = 1.0

    imgs = rng.random((I, 8, 8, 1)).astype(np.float32)
    if emb is not None:
        proj = rng.normal(size=(emb.shape[1], 64)).astype(np.float32)
        pat = 1.0 / (1.0 + np.exp(-4.0 * (emb @ proj)))  # [I, 64] in (0,1)
        imgs = (1.0 - signal) * imgs + signal * pat.reshape(I, 8, 8, 1)

    return {
        "cnn": dense(rng.normal(size=(I, 24))),
        "color": dense(rng.random((I, 16))),
        "edges": dense(rng.random((I, 12))),
        "spatial": rng.normal(size=(I, 4, 8)).astype(np.float32) * 0.1,
        # encoder-model inputs: small edge images keep the torch-CPU conv
        # towers tractable at parity scale; class one-hots like the
        # reference's VGG-classification encodings (extract_features.py:42-47)
        "edge_imgs": imgs,
        "class": onehot,
        "texture": dense(rng.normal(size=(I, 20))),
    }


def _epoch_triples(data, train_sets, rng, U, I):
    """The reference's exact epoch scheme: shuffle users, visit positives in
    stored order, rejection-sample each negative (dataset.py:94-103)."""
    users_order = list(range(U))
    random.shuffle(users_order)
    triples = []
    for u in users_order:
        for i in data.training_list[u]:
            j = rng.integers(I)
            while j in train_sets[u]:
                j = rng.integers(I)
            triples.append((u, i, j))
    return triples


def _run_torch_epochs(data, args, step_fn, seed=0):
    random.seed(seed)
    rng = np.random.default_rng(seed)
    train_sets = [set(r) for r in data.training_list]
    U, I = data.num_users, data.num_items
    for _ in range(args.epochs):
        triples = _epoch_triples(data, train_sets, rng, U, I)
        steps = len(triples) // args.batch
        for s in range(steps):
            chunk = triples[s * args.batch : (s + 1) * args.batch]
            u = torch.tensor([t[0] for t in chunk])
            p = torch.tensor([t[1] for t in chunk])
            n = torch.tensor([t[2] for t in chunk])
            step_fn(u, p, n)


def _bpr_core(x_pos, x_neg):
    diff = torch.clamp(x_pos - x_neg, -80.0, 1e8)
    return torch.nn.functional.softplus(-diff).sum()


def train_reference_torch_bprmf(data, args, seed=0):
    """BPRMF.py:87-125: summed BPR softplus with clip, neg-bias reg/10,
    dense Adam eps=1e-7."""
    torch.manual_seed(seed)
    U, I, K = data.num_users, data.num_items, args.embed_k
    reg = args.reg
    Bi = torch.zeros(I, requires_grad=True)
    Gu, Gi = _glorot(U, K), _glorot(I, K)
    opt = torch.optim.Adam([Bi, Gu, Gi], lr=args.lr, eps=1e-7)

    def step(u, p, n):
        opt.zero_grad()
        gu, gp, gn = Gu[u], Gi[p], Gi[n]
        x_pos = Bi[p] + (gu * gp).sum(1)
        x_neg = Bi[n] + (gu * gn).sum(1)
        loss = _bpr_core(x_pos, x_neg)
        loss = loss + reg * (
            gu.pow(2).sum() + gp.pow(2).sum() + gn.pow(2).sum()
        ) + reg * Bi[p].pow(2).sum() + reg * Bi[n].pow(2).sum() / 10
        loss.backward()
        opt.step()

    _run_torch_epochs(data, args, step, seed)
    return (
        Bi.detach().numpy()[None, :]
        + Gu.detach().numpy() @ Gi.detach().numpy().T
    )


def train_reference_torch_vbpr(data, args, feats, seed=0):
    """VBPR.py:99-144: adds theta_u.(f_i E) + f_i.Bp; reg on batch
    {gu,gp,gn,tu}, bias pos full / neg /10, whole matrices E and Bp."""
    torch.manual_seed(seed)
    U, I, K, D = data.num_users, data.num_items, args.embed_k, args.embed_d
    reg = args.reg
    F = torch.tensor(feats["cnn"])
    dim_f = F.shape[1]
    Bi = torch.zeros(I, requires_grad=True)
    Gu, Gi = _glorot(U, K), _glorot(I, K)
    Tu, E, Bp = _glorot(U, D), _glorot(dim_f, D), _glorot(dim_f, 1)
    opt = torch.optim.Adam([Bi, Gu, Gi, Tu, E, Bp], lr=args.lr, eps=1e-7)

    def score(u, it):
        fi = F[it]
        return (
            Bi[it] + (Gu[u] * Gi[it]).sum(1)
            + (Tu[u] * (fi @ E)).sum(1) + (fi @ Bp).squeeze(1)
        )

    def step(u, p, n):
        opt.zero_grad()
        loss = _bpr_core(score(u, p), score(u, n))
        loss = loss + reg * (
            Gu[u].pow(2).sum() + Gi[p].pow(2).sum()
            + Gi[n].pow(2).sum() + Tu[u].pow(2).sum()
        ) + reg * Bi[p].pow(2).sum() + reg * Bi[n].pow(2).sum() / 10 \
            + reg * (E.pow(2).sum() + Bp.pow(2).sum())
        loss.backward()
        opt.step()

    _run_torch_epochs(data, args, step, seed)
    with torch.no_grad():
        scores = Bi[None, :] + Gu @ Gi.T + Tu @ (F @ E).T + (F @ Bp).squeeze(1)
    return scores.numpy()


def train_reference_torch_grad_fashion(data, args, feats, seed=0):
    """GradFashion.py:136-193: concat(color@Ec, edges@Ee) visual features;
    BOTH biases at full reg (no /10); whole matrices Ec/Ee/E/Bp."""
    torch.manual_seed(seed)
    U, I, K, D = data.num_users, data.num_items, args.embed_k, args.embed_d
    dc, de = args.embed_color, args.embed_edges
    reg = args.reg
    Fc = torch.tensor(feats["color"])
    Fe = torch.tensor(feats["edges"])
    Bi = torch.zeros(I, requires_grad=True)
    Gu, Gi = _glorot(U, K), _glorot(I, K)
    Ec, Ee = _glorot(Fc.shape[1], dc), _glorot(Fe.shape[1], de)
    E, Bp, Tu = _glorot(dc + de, D), _glorot(dc + de, 1), _glorot(U, D)
    opt = torch.optim.Adam(
        [Gu, Gi, Bi, Ec, Ee, Tu, E, Bp], lr=args.lr, eps=1e-7
    )

    def score(u, it):
        vf = torch.cat([Fc[it] @ Ec, Fe[it] @ Ee], dim=1)
        return (
            Bi[it] + (Gu[u] * Gi[it]).sum(1)
            + (Tu[u] * (vf @ E)).sum(1) + (vf @ Bp).squeeze(1)
        )

    def step(u, p, n):
        opt.zero_grad()
        loss = _bpr_core(score(u, p), score(u, n))
        loss = loss + reg * (
            Gu[u].pow(2).sum() + Gi[p].pow(2).sum()
            + Gi[n].pow(2).sum() + Tu[u].pow(2).sum()
        ) + reg * (Bi[p].pow(2).sum() + Bi[n].pow(2).sum()) \
            + reg * (Ec.pow(2).sum() + Ee.pow(2).sum()
                     + E.pow(2).sum() + Bp.pow(2).sum())
        loss.backward()
        opt.step()

    _run_torch_epochs(data, args, step, seed)
    with torch.no_grad():
        VF = torch.cat([Fc @ Ec, Fe @ Ee], dim=1)
        scores = Bi[None, :] + Gu @ Gi.T + Tu @ (VF @ E).T + (VF @ Bp).squeeze(1)
    return scores.numpy()


def train_reference_torch_acf(data, args, feats, semantics, seed=0):
    """ACF.py:135-264.  `semantics`:
    - "endtoend": gradients flow through the attentive profile (the paper's
      training; what this framework implements);
    - "as_shipped": the profile is DETACHED before scoring
      (tf.Variable(np.asarray(...)), ACF.py:205-211) — only Gi learns from
      the ranking loss, everything else sees reg decay only."""
    torch.manual_seed(seed)
    U, I, K = data.num_users, data.num_items, args.embed_k
    reg = args.reg
    t_c, t_i = args.layers_component, args.layers_item
    Fspat = torch.tensor(feats["spatial"])  # [I, S, C]
    C = Fspat.shape[2]
    # train profile positives (uniform length by construction of the
    # synthetic split); eval adds the validation item (ACF.py:216-218)
    pos_train = torch.tensor(np.asarray(data.training_list, dtype=np.int64))
    pos_eval = torch.tensor(np.asarray(
        [t + v for t, v in zip(data.training_list, data.validation_list)],
        dtype=np.int64,
    ))

    g = torch.Generator().manual_seed(seed)
    Gu = (torch.randn(U, K, generator=g) * 0.01).requires_grad_()
    Gi = (torch.randn(I, K, generator=g) * 0.01).requires_grad_()
    Pi = (torch.randn(I, K, generator=g) * 0.01).requires_grad_()
    comp = {
        "W0_u": _glorot(K, t_c[0]), "W0_i": _glorot(C, t_c[0]),
        "b0": _glorot(1, t_c[0])[0].detach().requires_grad_(),
    }
    for c in range(1, len(t_c)):
        comp[f"W{c}"] = _glorot(t_c[c], t_c[c - 1])
        comp[f"b{c}"] = _glorot(1, t_c[c])[0].detach().requires_grad_()
    item = {
        "W0_u": _glorot(K, t_i[0]), "W0_iv": _glorot(K, t_i[0]),
        "W0_ip": _glorot(K, t_i[0]), "W0_ix": _glorot(C, t_i[0]),
        "b0": _glorot(1, t_i[0])[0].detach().requires_grad_(),
    }
    for c in range(1, len(t_i)):
        item[f"W{c}"] = _glorot(t_i[c], t_i[c - 1])
        item[f"b{c}"] = _glorot(1, t_i[c])[0].detach().requires_grad_()
    params = [Gu, Gi, Pi, *comp.values(), *item.values()]
    opt = torch.optim.Adam(params, lr=args.lr, eps=1e-7)

    def profiles(users, pos):
        """Attentive user profile g_u + sum(alpha p_i) for a [B] user batch
        with uniform-length positive lists pos [B, P] (ACF.py:135-181)."""
        f = Fspat[pos]  # [B, P, S, C]
        gu = Gu[users]  # [B, K]
        b = (
            (gu @ comp["W0_u"])[:, None, None, :]
            + torch.einsum("bpsc,ct->bpst", f, comp["W0_i"])
            + comp["b0"]
        )
        b = torch.relu(b)
        for c in range(1, len(t_c)):
            b = torch.einsum("bpst,ut->bpsu", b, comp[f"W{c}"]) + comp[f"b{c}"]
        beta = torch.softmax(b[..., 0], dim=2)  # [B, P, S]
        x_l = torch.einsum("bps,bpsc->bpc", beta, f)
        gi, pi = Gi[pos], Pi[pos]
        a = (
            (gu @ item["W0_u"])[:, None, :]
            + gi @ item["W0_iv"] + pi @ item["W0_ip"]
            + x_l @ item["W0_ix"] + item["b0"]
        )
        a = torch.relu(a)
        for c in range(1, len(t_i)):
            a = torch.einsum("bpt,ut->bpu", a, item[f"W{c}"]) + item[f"b{c}"]
        alpha = torch.softmax(a[..., 0], dim=1)  # [B, P]
        return gu + torch.einsum("bp,bpk->bk", alpha, pi)

    def step(u, p, n):
        opt.zero_grad()
        gup = profiles(u, pos_train[u])
        if semantics == "as_shipped":
            gup = gup.detach()  # tf.Variable(np.asarray(...)), ACF.py:210
        x_pos = (gup * Gi[p]).sum(1)
        x_neg = (gup * Gi[n]).sum(1)
        loss = _bpr_core(x_pos, x_neg)
        loss = loss + reg * (
            Gu[u].pow(2).sum() + Gi[p].pow(2).sum() + Gi[n].pow(2).sum()
            + Pi[p].pow(2).sum() + Pi[n].pow(2).sum()
            + sum(w.pow(2).sum() for w in comp.values())
            + sum(w.pow(2).sum() for w in item.values())
        )
        loss.backward()
        opt.step()

    _run_torch_epochs(data, args, step, seed)
    with torch.no_grad():
        gup = profiles(torch.arange(U), pos_eval)  # eval profile: train+val
        scores = gup @ Gi.T
    return scores.numpy()


def _glorot_conv(kh, kw, cin, cout):
    """Keras GlorotUniform for conv kernels (fan over the receptive field),
    returned in torch layout [cout, cin, kh, kw]."""
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return (torch.rand(cout, cin, kh, kw) * 2 * limit - limit).requires_grad_()


def _same_conv(x, w, b, stride=1):
    """TF/Keras padding='same' conv (torch Conv2d can't do same+stride>1)."""
    import torch.nn.functional as tF

    kh, kw = w.shape[2], w.shape[3]
    ih, iw = x.shape[2], x.shape[3]
    oh, ow = -(-ih // stride), -(-iw // stride)
    ph = max((oh - 1) * stride + kh - ih, 0)
    pw = max((ow - 1) * stride + kw - iw, 0)
    x = tF.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return tF.conv2d(x, w, b, stride=stride)


def _same_maxpool2(x):
    """MaxPool2D(2, 2, padding='same') — ceil_mode covers the odd edge."""
    import torch.nn.functional as tF

    return tF.max_pool2d(x, 2, 2, ceil_mode=True)


def train_reference_torch_attentive_fashion(data, args, feats, seed=0):
    """AttentiveFashion.py:209-256: three trainable encoders (color MLP /
    edges Conv2D tower / class MLP, :50-71, Keras defaults: Glorot weights,
    zero biases, Dropout(0.5) active in training), user-gated modality
    attention (:146-166, relu on layer 0 only, softmax over the 3
    modalities), score sum(gamma_u * weighted * gamma_i) (:193-199), reg on
    batch embeddings + ENCODER OUTPUTS (post-dropout, as the tape sees
    them) + all attention matrices (:228-243).  No item bias in the score
    and no /10 anywhere."""
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    U, I, K = data.num_users, data.num_items, args.embed_k
    reg = args.reg
    t_att = args.attention_layers
    Fc = torch.tensor(feats["color"])
    Fimg = torch.tensor(feats["edge_imgs"]).permute(0, 3, 1, 2).contiguous()
    Fcls = torch.tensor(feats["class"])
    Gu, Gi = _glorot(U, K), _glorot(I, K)

    def mlp(dim):
        return {
            "W1": _glorot(dim, 256),
            "b1": torch.zeros(256, requires_grad=True),
            "W2": _glorot(256, K),
        }

    color_enc, class_enc = mlp(Fc.shape[1]), mlp(Fcls.shape[1])
    edges_enc = {
        "conv_W": _glorot_conv(5, 5, 1, 64),
        "conv_b": torch.zeros(64, requires_grad=True),
        "W2": _glorot(64, K),
    }
    att = {}
    prev = K
    for l, width in enumerate(t_att):
        att[f"W{l + 1}"] = _glorot(prev, width)
        att[f"b{l + 1}"] = _glorot(1, width)[0].detach().requires_grad_()
        prev = width
    params = [
        Gu, Gi, *color_enc.values(), *class_enc.values(),
        *edges_enc.values(), *att.values(),
    ]
    opt = torch.optim.Adam(params, lr=args.lr, eps=1e-7)

    def encode(items, training):
        c = torch.relu(Fc[items] @ color_enc["W1"] + color_enc["b1"])
        c = tF.dropout(c, 0.5, training) @ color_enc["W2"]
        e = torch.relu(
            _same_conv(Fimg[items], edges_enc["conv_W"], edges_enc["conv_b"])
        )
        e = _same_maxpool2(e).mean(dim=(2, 3))  # GAP
        e = tF.dropout(e, 0.5, training) @ edges_enc["W2"]
        k = torch.relu(Fcls[items] @ class_enc["W1"] + class_enc["b1"])
        k = tF.dropout(k, 0.5, training) @ class_enc["W2"]
        return torch.stack([c, e, k], dim=-2)  # [..., 3, K]

    def attention(gu, e):
        h = gu.unsqueeze(-2) * e
        for l in range(len(t_att)):
            h = h @ att[f"W{l + 1}"] + att[f"b{l + 1}"]
            if l == 0:
                h = torch.relu(h)
        return torch.softmax(h, dim=-2)

    def score(gu, gi, e):
        alpha = attention(gu, e)
        return (gu * (alpha * e).sum(-2) * gi).sum(-1)

    def step(u, p, n):
        opt.zero_grad()
        gu = Gu[u]
        e_pos, e_neg = encode(p, True), encode(n, True)
        x_pos = score(gu, Gi[p], e_pos)
        x_neg = score(gu, Gi[n], e_neg)
        loss = _bpr_core(x_pos, x_neg)
        loss = loss + reg * (
            gu.pow(2).sum() + Gi[p].pow(2).sum() + Gi[n].pow(2).sum()
            + e_pos.pow(2).sum() + e_neg.pow(2).sum()
            + sum(w.pow(2).sum() for w in att.values())
        )
        loss.backward()
        opt.step()

    _run_torch_epochs(data, args, step, seed)
    with torch.no_grad():
        e_items = encode(torch.arange(I), False)  # [I, 3, K]
        scores = torch.empty(U, I)
        for s in range(0, U, 64):
            gu = Gu[s : s + 64]
            scores[s : s + 64] = score(
                gu[:, None, :], Gi[None, :, :], e_items[None, :, :, :]
            )
    return scores.numpy()


def train_reference_torch_comp_vbpr(data, args, feats, seed=0):
    """CompVBPR.py:105-311, all four families active: three frozen-feature
    projections (semantic/color/texture: w*(<Tu*, F@E*> + F.Bp*)) plus the
    trainable AlexNet-style edge tower (cnn.py:10-66; dropout after fc6/fc7
    in training) with its bias on the ENCODED vector (theta_e @ Bpe,
    :199).  Reg :268-290 — batch factors + per-family user profiles, neg
    bias /10, whole-matrix E*/Bp* and CNN non-bias weights."""
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    U, I, K, D = data.num_users, data.num_items, args.embed_k, args.embed_d
    reg = args.reg
    w_s, w_c, w_e, w_t = args.weight_components
    Fs = torch.tensor(feats["cnn"])
    Fc = torch.tensor(feats["color"])
    Ft = torch.tensor(feats["texture"])
    Fimg = torch.tensor(feats["edge_imgs"]).permute(0, 3, 1, 2).contiguous()

    Bi = torch.zeros(I, requires_grad=True)
    Gu, Gi = _glorot(U, K), _glorot(I, K)
    fam = {}
    for tag, F in (("s", Fs), ("c", Fc), ("t", Ft)):
        dim = F.shape[1]
        fam[tag] = {
            "Bp": _glorot(dim, 1), "Tu": _glorot(U, D), "E": _glorot(dim, D),
        }
    Bpe, Tue = _glorot(D, 1), _glorot(U, D)
    # AlexNet-style tower (cnn.py), Keras defaults: glorot kernels, zero
    # biases; input 8x8 -> stride-4 conv -> 3 same-pools -> flat 256
    cnn = {
        "conv1_W": _glorot_conv(11, 11, 1, 64),
        "conv1_b": torch.zeros(64, requires_grad=True),
        "conv2_W": _glorot_conv(5, 5, 64, 256),
        "conv2_b": torch.zeros(256, requires_grad=True),
        "conv3_W": _glorot_conv(3, 3, 256, 256),
        "conv3_b": torch.zeros(256, requires_grad=True),
        "conv4_W": _glorot_conv(3, 3, 256, 256),
        "conv4_b": torch.zeros(256, requires_grad=True),
        "conv5_W": _glorot_conv(3, 3, 256, 256),
        "conv5_b": torch.zeros(256, requires_grad=True),
        "fc6_W": _glorot(256, 4096),
        "fc6_b": torch.zeros(4096, requires_grad=True),
        "fc7_W": _glorot(4096, 4096),
        "fc7_b": torch.zeros(4096, requires_grad=True),
        "fc8_W": _glorot(4096, D),
        "fc8_b": torch.zeros(D, requires_grad=True),
    }
    params = [
        Bi, Gu, Gi, Bpe, Tue,
        *[w for f in fam.values() for w in f.values()], *cnn.values(),
    ]
    opt = torch.optim.Adam(params, lr=args.lr, eps=1e-7)

    def tower(imgs, training):
        x = torch.relu(_same_conv(imgs, cnn["conv1_W"], cnn["conv1_b"], 4))
        x = _same_maxpool2(x)
        x = torch.relu(_same_conv(x, cnn["conv2_W"], cnn["conv2_b"]))
        x = _same_maxpool2(x)
        x = torch.relu(_same_conv(x, cnn["conv3_W"], cnn["conv3_b"]))
        x = torch.relu(_same_conv(x, cnn["conv4_W"], cnn["conv4_b"]))
        x = torch.relu(_same_conv(x, cnn["conv5_W"], cnn["conv5_b"]))
        x = _same_maxpool2(x).flatten(1)
        x = tF.dropout(torch.relu(x @ cnn["fc6_W"] + cnn["fc6_b"]),
                       0.5, training)
        x = tF.dropout(torch.relu(x @ cnn["fc7_W"] + cnn["fc7_b"]),
                       0.5, training)
        return x @ cnn["fc8_W"] + cnn["fc8_b"]

    def score(u, it, theta_e):
        x = Bi[it] + (Gu[u] * Gi[it]).sum(1)
        for tag, F, w in (("s", Fs, w_s), ("c", Fc, w_c), ("t", Ft, w_t)):
            f = F[it]
            x = x + w * (
                (fam[tag]["Tu"][u] * (f @ fam[tag]["E"])).sum(1)
                + (f @ fam[tag]["Bp"]).squeeze(1)
            )
        x = x + w_e * (
            (Tue[u] * theta_e).sum(1) + (theta_e @ Bpe).squeeze(1)
        )
        return x

    def step(u, p, n):
        opt.zero_grad()
        th_p, th_n = tower(Fimg[p], True), tower(Fimg[n], True)
        loss = _bpr_core(score(u, p, th_p), score(u, n, th_n))
        loss = loss + reg * (
            Gu[u].pow(2).sum() + Gi[p].pow(2).sum() + Gi[n].pow(2).sum()
            + sum(f["Tu"][u].pow(2).sum() for f in fam.values())
            + Tue[u].pow(2).sum()
        ) + reg * Bi[p].pow(2).sum() + reg * Bi[n].pow(2).sum() / 10 \
            + reg * (
                sum(f["E"].pow(2).sum() + f["Bp"].pow(2).sum()
                    for f in fam.values())
                + Bpe.pow(2).sum()
                + sum(v.pow(2).sum() for k, v in cnn.items()
                      if not k.endswith("_b"))
            )
        loss.backward()
        opt.step()

    _run_torch_epochs(data, args, step, seed)
    with torch.no_grad():
        Fe = torch.cat([
            tower(Fimg[s : s + 64], False) for s in range(0, I, 64)
        ])
        scores = Bi[None, :] + Gu @ Gi.T
        for tag, F, w in (("s", Fs, w_s), ("c", Fc, w_c), ("t", Ft, w_t)):
            scores = scores + w * (
                fam[tag]["Tu"] @ (F @ fam[tag]["E"]).T
                + (F @ fam[tag]["Bp"]).squeeze(1)[None, :]
            )
        scores = scores + w_e * (Tue @ Fe.T + (Fe @ Bpe).squeeze(1)[None, :])
    return scores.numpy()


def build_ours(args, data, feats):
    if args.rec == "bprmf":
        from fashionvisualexpl_tpu.models.bprmf import BPRMF

        return BPRMF(data.num_users, data.num_items, embed_k=args.embed_k)
    if args.rec == "vbpr":
        from fashionvisualexpl_tpu.models.vbpr import VBPR

        return VBPR(data.num_users, data.num_items, feats["cnn"],
                    embed_k=args.embed_k, embed_d=args.embed_d)
    if args.rec == "grad_fashion":
        from fashionvisualexpl_tpu.models.grad_fashion import GradFashion

        return GradFashion(
            data.num_users, data.num_items, feats["color"], feats["edges"],
            embed_k=args.embed_k, embed_d=args.embed_d,
            embed_color=args.embed_color, embed_edges=args.embed_edges,
        )
    if args.rec == "acf":
        from fashionvisualexpl_tpu.models.acf import ACF

        return ACF(
            data.num_users, data.num_items, feats["spatial"], data,
            embed_k=args.embed_k,
            layers_component=tuple(args.layers_component),
            layers_item=tuple(args.layers_item),
            compute_dtype=args.compute_dtype,
        )
    if args.rec == "attentive_fashion":
        from fashionvisualexpl_tpu.models.attentive_fashion import (
            AttentiveFashion,
        )

        return AttentiveFashion(
            data.num_users, data.num_items,
            feats["color"], feats["edge_imgs"], feats["class"],
            embed_k=args.embed_k,
            attention_layers=tuple(args.attention_layers),
        )
    if args.rec == "comp_vbpr":
        from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR

        return CompVBPR(
            data.num_users, data.num_items,
            semantic_features=feats["cnn"], color_features=feats["color"],
            edge_images=feats["edge_imgs"], texture_features=feats["texture"],
            embed_k=args.embed_k, embed_d=args.embed_d,
            weight_components=tuple(args.weight_components),
        )
    raise SystemExit(f"unknown --rec {args.rec}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rec", default="bprmf",
                    choices=["bprmf", "vbpr", "grad_fashion", "acf",
                             "attentive_fashion", "comp_vbpr"])
    ap.add_argument("--users", type=int, default=300)
    ap.add_argument("--items", type=int, default=400)
    ap.add_argument("--per_user", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--embed_k", type=int, default=32)
    ap.add_argument("--embed_d", type=int, default=8)
    ap.add_argument("--embed_color", type=int, default=8)
    ap.add_argument("--embed_edges", type=int, default=8)
    ap.add_argument("--layers_component", nargs="+", type=int, default=[16, 1])
    ap.add_argument("--layers_item", nargs="+", type=int, default=[16, 1])
    ap.add_argument("--attention_layers", nargs="+", type=int, default=[16, 1])
    ap.add_argument("--weight_components", nargs="+", type=float,
                    default=[0.25, 0.25, 0.25, 0.25])
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--reg", type=float, default=0.001)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top_k", type=int, default=20)
    ap.add_argument("--acf_semantics", default="endtoend",
                    choices=["endtoend", "as_shipped", "both"])
    ap.add_argument("--seed", type=int, default=0,
                    help="seeds BOTH stacks' init/sampling (the dataset "
                        "stays fixed) — vary it to measure run-to-run "
                        "variance, the yardstick the deltas are judged by")
    ap.add_argument("--train_path", choices=["generic", "packed"],
                    default="generic",
                    help="also validates the packed/LazyAdam path's accuracy")
    ap.add_argument("--moment_dtype",
                    choices=["float32", "bfloat16", "float8"],
                    default="float32",
                    help="packed path: bf16 Adam-moment storage — measures "
                         "the quantized-moment accuracy impact")
    ap.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="acf: attention-MLP compute dtype — measures the "
                         "bf16-attention accuracy impact")
    ap.add_argument("--lazy_catchup", action="store_true",
                    help="packed path: closed-form momentum catch-up on "
                         "touch — measures recovery of LazyAdam's "
                         "convergence gap")
    ap.add_argument("--feature_signal", type=float, default=0.0,
                    help="blend of train-co-occurrence SVD structure into "
                         "the synthetic features (0 = pure noise, the "
                         "round-2 setting).  Use ~0.5 for the encoder "
                         "models whose item pathway is feature-gated — "
                         "see make_features docstring")
    args = ap.parse_args()

    import contextlib
    import io

    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import (
        multi_hot, pad_lists, synthetic_interactions,
    )
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.ops.metrics import eval_users, mean_metrics
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(
        args.users, args.items, interactions_per_user=args.per_user, seed=0
    )
    feats = make_features(data, signal=args.feature_signal)

    def metrics_of(scores):
        train_mask = jnp.asarray(multi_hot(data.training_list, data.num_items))
        items, counts = pad_lists(data.test_list, pad_value=0)
        m = mean_metrics(eval_users(
            jnp.asarray(scores), train_mask, jnp.asarray(items),
            jnp.asarray(counts), args.top_k,
        ))
        return {"hr": float(m.hr), "rec": float(m.rec), "auc": float(m.auc),
                "ndcg": float(m.ndcg)}

    # ours (TPU framework)
    cfg = TrainConfig(batch_size=args.batch, epochs=args.epochs, lr=args.lr,
                      reg=args.reg, top_k=args.top_k, eval_every=args.epochs,
                      train_path=args.train_path, seed=args.seed,
                      moment_dtype=args.moment_dtype,
                      lazy_catchup=args.lazy_catchup)
    model = build_ours(args, data, feats)
    ev = Evaluator(model, data, k=args.top_k, user_block=256)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    ours = metrics_of(np.asarray(model.predict_all(state.params, frozen)))

    # reference execution model (torch eager, reference semantics)
    out = {"ours": ours, "config": vars(args)}
    if args.rec == "bprmf":
        ref = metrics_of(train_reference_torch_bprmf(data, args, seed=args.seed))
    elif args.rec == "vbpr":
        ref = metrics_of(train_reference_torch_vbpr(data, args, feats, seed=args.seed))
    elif args.rec == "grad_fashion":
        ref = metrics_of(train_reference_torch_grad_fashion(data, args, feats, seed=args.seed))
    elif args.rec == "attentive_fashion":
        ref = metrics_of(
            train_reference_torch_attentive_fashion(data, args, feats, seed=args.seed)
        )
    elif args.rec == "comp_vbpr":
        ref = metrics_of(
            train_reference_torch_comp_vbpr(data, args, feats, seed=args.seed)
        )
    else:
        sem = args.acf_semantics
        if sem in ("endtoend", "both"):
            ref = metrics_of(
                train_reference_torch_acf(data, args, feats, "endtoend", seed=args.seed)
            )
        if sem in ("as_shipped", "both"):
            shipped = metrics_of(
                train_reference_torch_acf(data, args, feats, "as_shipped", seed=args.seed)
            )
            out["reference_impl_as_shipped"] = shipped
            if sem == "as_shipped":
                ref = shipped
    out["reference_impl"] = ref
    out["abs_delta"] = {k: abs(ours[k] - ref[k]) for k in ours}
    print(json.dumps(out))


if __name__ == "__main__":
    main()


# legacy alias (round-1 name): BPRMF-only entry
def train_reference_torch(data, epochs, embed_k, lr, reg, batch, seed=0):
    ns = argparse.Namespace(epochs=epochs, embed_k=embed_k, lr=lr, reg=reg,
                            batch=batch)
    return train_reference_torch_bprmf(data, ns, seed)
