"""Basic fused building blocks: linear, MLP, dropout, windowed-CNN embed, highway.

All functions are pure; parameters are nested dicts in torch layout (see
utils/torch_init.py).  Dropout takes an explicit PRNG key; `rng=None` means
deterministic (eval) mode, matching model.eval() in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params, x):
    """y = x @ W.T + b with torch-layout W [out, in].

    XLA folds the transpose into the dot_general; on TPU this is a single MXU
    matmul regardless of layout.
    """
    return jnp.einsum("...i,oi->...o", x, params["weight"]) + params["bias"]


def mlp_relu(p1, p2, x, rng=None, dropout_p=0.0):
    """Linear -> ReLU -> [Dropout] -> Linear — the reference's ubiquitous
    two-layer head (e.g. PositionwiseFeedForward, MFN gate MLPs, out heads)."""
    h = jax.nn.relu(linear(p1, x))
    h = dropout(h, rng, dropout_p)
    return linear(p2, h)


_DROPOUT_IMPLS = ("hash", "hash4", "threefry")
_dropout_impl_override: str | None = None


def set_dropout_impl(impl: str | None) -> None:
    """Select the dropout mask generator ("hash" or "threefry", None resets
    to the default).  The MMTX_DROPOUT_IMPL env var beats this."""
    if impl is not None and impl not in _DROPOUT_IMPLS:
        raise ValueError(f"dropout impl must be one of {_DROPOUT_IMPLS}, "
                         f"got {impl!r}")
    global _dropout_impl_override
    _dropout_impl_override = impl


def _dropout_impl() -> str:
    import os
    env = os.environ.get("MMTX_DROPOUT_IMPL")
    if env in _DROPOUT_IMPLS:
        return env
    if _dropout_impl_override is not None:
        return _dropout_impl_override
    # default "hash": 1.86x the measured MFT train step on v5e (32.6 ->
    # 17.6 ms/step, examples/bench_train.py A/B) — threefry bit-generation
    # dominated the step.  Same inverted-dropout semantics, deterministic
    # in (key, shape), identical on CPU and TPU.
    return "hash"


def _ablate_dropout() -> bool:
    """Measurement-only ablation knob (see dropout's docstring)."""
    import os
    if os.environ.get("MMTX_ABLATE_DROPOUT") == "1":
        from .dispatch import warn_ablation
        warn_ablation("MMTX_ABLATE_DROPOUT",
                      "every dropout site becomes an identity")
        return True
    return False


def hash_seed(rng):
    """Fold a JAX PRNG key into one uint32 seed for hash_keep_mask.

    Works for any key impl (threefry key_data is (2,), rbg (4,)): mix the
    words with distinct odd constants so different keys (e.g. the two
    halves of a split) land far apart."""
    kd = jax.random.key_data(rng).ravel().astype(jnp.uint32)
    seed = jnp.uint32(0x2545F491)
    for i in range(kd.shape[0]):
        seed = (seed ^ kd[i]) * jnp.uint32(0x9E3779B1 + 2 * i)
    return seed


def hash_keep_mask(seed, idx, p: float):
    """Counter-based Bernoulli(1-p) keep mask: murmur3's fmix32 finalizer
    over a position counter with the seed injected up front.

    fmix32 is designed to avalanche sequential integers, which is exactly
    the dropout requirement (decorrelate neighboring positions); it is ~6
    vector ops/element vs threefry's 20 rounds — the reason the "hash"
    dropout impl exists (threefry bit-generation dominates the reference
    train step on TPU, examples/bench_train.py).  Deterministic and
    platform-independent: pure uint32 arithmetic, identical on CPU/TPU —
    and reproducible inside a Pallas kernel from (seed, position) alone,
    which is what lets a fused kernel apply the same masks the jnp
    backward regenerates.

    seed: uint32 scalar; idx: uint32 position counter array; returns a
    bool array of idx's shape with P(True) = 1 - p."""
    h = idx * jnp.uint32(0x9E3779B1) + seed
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    # P(h < t) = p for t = round(p * 2^32) over the uniform uint32 h
    threshold = jnp.uint32(min(int(round(p * 2.0 ** 32)), 2 ** 32 - 1))
    return h >= threshold


def hash4_threshold(p: float) -> int:
    """8-bit keep threshold for the hash4 impl: drop iff byte < t8.

    t8 = round(p * 256) quantizes the drop probability to 1/256 steps, so
    the realized keep probability differs from (1 - p) by at most 1/512
    (= 0.2 pp; <= 0.22% RELATIVE for every p <= 0.5 used by the reference
    — p=0.1 keeps 0.8984 vs 0.9, p=0.3 keeps 0.6992 vs 0.7).  The 1/(1-p)
    inverted-dropout scale keeps using the NOMINAL p, so activations carry
    the same <=0.22% expectation bias — documented, measured-knob
    territory, not silent (hash4 is opt-in)."""
    return min(int(round(p * 256.0)), 255)


def hash4_keep_rows(seed, n_rows: int, width: int, p: float):
    """Multi-bit hash4 keep mask for a [n_rows, width] site
    (width % 4 == 0): ONE fmix32 evaluation yields FOUR keep bytes, so
    mask generation runs on a 4x smaller grid than hash_keep_mask — the
    attn-prob site is 62% of all mask bits and its fmix32 generation is
    most of the measured 1.25 ms/step kernel-path dropout cost
    (ops/dispatch.py).  Layout is BLOCKED along the last axis: column
    c in block k = c // (width/4) takes byte k of h(row4 + c % (width/4)),
    where row4 = row * width/4 — pure lane concats, no interleave
    relayouts, and reproducible inside a Pallas kernel from (seed, global
    row, column) alone (ops/pallas/encoder.py mirrors it)."""
    w4 = width // 4
    idx4 = jnp.arange(n_rows * w4, dtype=jnp.uint32).reshape(n_rows, w4)
    h = idx4 * jnp.uint32(0x9E3779B1) + seed
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    t8 = jnp.uint32(hash4_threshold(p))
    return jnp.concatenate(
        [((h >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)) >= t8
         for k in range(4)], axis=-1)


def dropout(x, rng, p: float):
    """Inverted dropout, identical to torch nn.Dropout train-mode scaling.

    rng=None (or p==0) => identity (eval mode).  Mask bits come from the
    impl selected by MMTX_DROPOUT_IMPL / set_dropout_impl:
      - "hash" (default): counter-based fmix32 of the flat position,
        seeded from the key (hash_keep_mask) — same inverted-dropout
        semantics and the same per-site key independence (every call site
        already receives a distinct split key), ~an order of magnitude
        cheaper to generate than threefry, whose bit-generation dominated
        the TPU train step (1.86x step A/B, examples/bench_train.py);
      - "hash4" (opt-in): FOUR keep bits per fmix32 evaluation via 8-bit
        byte thresholds (hash4_keep_rows) — quarter the hash rounds for
        a documented <=1/512 absolute keep-probability quantization
        bias; sites whose last dim is not a multiple of 4 degrade to the
        per-element "hash" stream.  A DIFFERENT mask stream than "hash".
        Measured verdict (round 5, ops/dispatch.py): LOSES 14.8% on the
        full TPU train recipe — the quarter grid's narrow-lane vregs +
        byte extract/concat cost more than the saved fmix32 rounds —
        kept as the tested, documented negative result;
      - "threefry": jax.random.bernoulli on the passed key — the round-1
        behavior, for reproducing old training runs.
    Either way dropout is deterministic in (key, shape) and identical on
    CPU and TPU.

    MMTX_ABLATE_DROPOUT=1 is a measurement-only ablation (WRONG numerics:
    it silently disables regularization) that makes every dropout site an
    identity while leaving all dispatch decisions untouched — used to
    bound the total dropout cost of a kernel recipe (VERDICT r3 #5)."""
    if rng is None or p == 0.0 or _ablate_dropout():
        return x
    keep = 1.0 - p
    impl = _dropout_impl()
    if impl == "hash4" and x.ndim >= 1 and x.shape[-1] % 4 == 0:
        w = x.shape[-1]
        mask = hash4_keep_rows(hash_seed(rng), x.size // w, w,
                               p).reshape(x.shape)
    elif impl in ("hash", "hash4"):
        # hash4 on a width % 4 != 0 site degrades to the per-element hash
        # stream (same degradation inside the kernels — bits stay paired)
        idx = jnp.arange(x.size, dtype=jnp.uint32).reshape(x.shape)
        mask = hash_keep_mask(hash_seed(rng), idx, p)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def conv1d_window_embed(params, x):
    """Fused window CNN: Conv1d(D -> E, k=2) over frames + max-pool over the
    conv axis, batched over (batch, window).

    Replaces the reference's per-video Python loop (reference MFT/models.py:111-131
    + CNN at models.py:57-79): there, each video's [W, F, D] windows are permuted
    to [W, D, F], run through Conv1d(k=2), then MaxPool1d over the whole conv
    length.  Mathematically:

        conv[.., e, j] = x[.., j, :] @ K0[e] + x[.., j+1, :] @ K1[e] + b[e]
        out = max_j conv[.., e, j]

    We compute it as ONE large MXU matmul by concatenating adjacent frames:
    [B, W, F-1, 2D] @ [2D, E], then a max-reduce over the frame axis — no
    Python loops, fully batched over B*W windows, ideal MXU tiling.

    Measured alternatives (v5e, linguistic B=32 T=160 F=32 D=300 bf16,
    weight-perturb 50/400 chains): this pair-concat matmul 0.301 ms beats
    a two-tap sum (x@K0 + shift(x@K1), 0.384 ms) and a native
    lax.conv_general_dilated (0.324 ms) — XLA fuses the concat into the
    matmul, so the apparent [.., F-1, 2D] intermediate never hits HBM.

    x: [..., F, D] (F >= 2 frames per window), params from conv1d_init
    (weight [E, D, 2]).  Returns [..., E].
    """
    w = params["weight"]  # [E, D, 2]
    pairs = jnp.concatenate([x[..., :-1, :], x[..., 1:, :]], axis=-1)  # [..., F-1, 2D]
    kernel = jnp.concatenate([w[:, :, 0], w[:, :, 1]], axis=-1)  # [E, 2D]
    conv = jnp.einsum("...fd,ed->...fe", pairs, kernel) + params["bias"]
    return jnp.max(conv, axis=-2)


def highway(params, x, relu_proj: bool = False):
    """Highway gate: g*proj(x) + (1-g)*x, g = sigmoid(gate(x)).

    relu_proj=True applies ReLU to the projection — the B1-LSTM variant
    (reference B1-LSTM/models.py:52); the other four families do not
    (reference MFT/models.py:52-54).
    """
    proj = linear(params["linear_projection"], x)
    if relu_proj:
        proj = jax.nn.relu(proj)
    gate = jax.nn.sigmoid(linear(params["linear_gate"], x))
    return gate * proj + (1.0 - gate) * x
