"""LTE turbo codec: rate-1/3 PCCC encoder + windowed max-log-MAP decoder.

Re-design of the reference turbo stack (`lib/src/phy/fec/turbocoder.c`,
`turbodecoder*.c`, `turbodecoder_win.h`) for TPU:

* 8-state RSC pair (feedback 1+D^2+D^3, forward 1+D+D^3), QPP interleaver
  (see `cbsegm.qpp_interleaver_np`), 12 tail bits (TS 36.212 §5.1.3.2).
* Decoder = sub-block windowed max-log-MAP, the TPU analog of the
  reference's SIMD-lane windowing (`turbodecoder_win.h:576-787`):
  - the codeblock is split into `nw` windows laid out on a batch axis,
  - alpha and beta each run ONE `lax.scan` of length T+L over all windows
    at once (T = 32-step training region, mirroring `win_overlap_len 40`),
  - window boundaries come from training (zero-init) like the reference's
    lane-shuffle; window 0 alpha / last-window beta use the exact known
    initial / tail-trellis states,
  - extrinsics computed vectorized from stored alpha/beta.
* Iterations run under `lax.while_loop` with a batched CRC early-stop mask
  (the device-side analog of `sch.c:419-450`).

Shapes: LLR inputs are (B, ...) float32 with **positive LLR = bit 1**
(matching `demod_soft`).  All codeblocks in a batch share one K.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .cbsegm import qpp_interleaver_np

NEG_INF = np.float32(-1e30)
RATE = 3
TOTAL_TAIL = 12
TRAIN = 32  # training window (reference uses 40; 32 aligns with VPU lanes)


# --- trellis tables ---------------------------------------------------------


@lru_cache(maxsize=1)
def _trellis():
    """8-state RSC tables from the reference recursion (turbocoder.c:140-166).

    state s encodes (reg0 + 2*reg1 + 4*reg2); for input bit u:
      in  = u ^ reg1 ^ reg2          (value shifted in)
      out = reg2 ^ reg0 ^ in         (parity)
      s'  = in + 2*reg0 + 4*reg1
    Returns dict with next_state (8,2), parity (8,2), prev_state (8,2),
    prev_u (8,2), prev_parity (8,2), tail_bit (8), tail_next (8),
    tail_parity (8).
    """
    next_state = np.zeros((8, 2), np.int32)
    parity = np.zeros((8, 2), np.int32)
    for s in range(8):
        r0, r1, r2 = s & 1, (s >> 1) & 1, (s >> 2) & 1
        for u in (0, 1):
            inp = u ^ r1 ^ r2
            out = r2 ^ r0 ^ inp
            next_state[s, u] = inp + 2 * r0 + 4 * r1
            parity[s, u] = out
    prev_state = np.zeros((8, 2), np.int32)
    prev_u = np.zeros((8, 2), np.int32)
    prev_parity = np.zeros((8, 2), np.int32)
    cnt = np.zeros(8, np.int32)
    for s in range(8):
        for u in (0, 1):
            ns = next_state[s, u]
            prev_state[ns, cnt[ns]] = s
            prev_u[ns, cnt[ns]] = u
            prev_parity[ns, cnt[ns]] = parity[s, u]
            cnt[ns] += 1
    assert (cnt == 2).all()
    # tail transitions: forced in=0 → systematic bit = r1^r2
    tail_bit = np.zeros(8, np.int32)
    tail_next = np.zeros(8, np.int32)
    tail_parity = np.zeros(8, np.int32)
    for s in range(8):
        r0, r1, r2 = s & 1, (s >> 1) & 1, (s >> 2) & 1
        b = r1 ^ r2
        tail_bit[s] = b
        tail_parity[s] = r2 ^ r0  # out with in=0
        tail_next[s] = 0 + 2 * r0 + 4 * r1
    return dict(
        next_state=next_state,
        parity=parity,
        prev_state=prev_state,
        prev_u=prev_u,
        prev_parity=prev_parity,
        tail_bit=tail_bit,
        tail_next=tail_next,
        tail_parity=tail_parity,
    )


# --- encoder (host, for tests and signal generation) ------------------------


def _rsc_encode_np(bits: np.ndarray):
    """Parity stream of one RSC encoder; returns (parity, final_regs)."""
    t = _trellis()
    out = np.zeros(len(bits), np.uint8)
    s = 0
    for i, b in enumerate(bits):
        out[i] = t["parity"][s, b]
        s = t["next_state"][s, b]
    return out, s


def _rsc_tail_np(s: int):
    """3 tail steps: returns (sys_bits[3], parity_bits[3])."""
    t = _trellis()
    xs, zs = [], []
    for _ in range(3):
        xs.append(int(t["tail_bit"][s]))
        zs.append(int(t["tail_parity"][s]))
        s = int(t["tail_next"][s])
    assert s == 0
    return np.array(xs, np.uint8), np.array(zs, np.uint8)


def turbo_encode_np(bits: np.ndarray) -> np.ndarray:
    """Encode one codeblock → d-streams array (3, K+4), TS 36.212 §5.1.3.2.

    Rows are d^(0), d^(1), d^(2); the 12 tail bits are distributed over the
    last 4 columns exactly per spec (and `turbocoder.c` tail order).
    """
    k = len(bits)
    per = qpp_interleaver_np(k)
    p1, s1 = _rsc_encode_np(bits)
    p2, s2 = _rsc_encode_np(bits[per])
    x1, z1 = _rsc_tail_np(s1)  # encoder 1 tail: x_K..x_K+2, z_K..z_K+2
    x2, z2 = _rsc_tail_np(s2)
    d = np.zeros((3, k + 4), np.uint8)
    d[0, :k], d[1, :k], d[2, :k] = bits, p1, p2
    # TS 36.212 tail mapping
    d[0, k:] = [x1[0], z1[1], x2[0], z2[1]]
    d[1, k:] = [z1[0], x1[2], z2[0], x2[2]]
    d[2, k:] = [x1[1], z1[2], x2[1], z2[2]]
    return d


# --- windowed max-log-MAP ----------------------------------------------------


def _window_layout(k: int) -> tuple[int, int]:
    """(nof_windows, window_len): L divides K, targeting L ≈ 64."""
    if k <= 512:
        base = 8
    elif k <= 1024:
        base = 16
    elif k <= 2048:
        base = 32
    else:
        base = 64
    n_base = k // base
    m = 1
    for cand in range(min(64 // base, n_base), 0, -1):
        if n_base % cand == 0:
            m = cand
            break
    lw = base * m
    return k // lw, lw


def _beta_tail(lx_t, lz_t):
    """Exact beta at position K from the 3 tail steps.

    lx_t, lz_t: (B, 3) tail systematic/parity LLRs (decoder order).
    Returns (B, 8) beta_K.
    """
    t = _trellis()
    beta = jnp.full(lx_t.shape[:-1] + (8,), NEG_INF)
    beta = beta.at[..., 0].set(0.0)
    for step in (2, 1, 0):
        x, z = 0.5 * lx_t[..., step : step + 1], 0.5 * lz_t[..., step : step + 1]
        sb = jnp.asarray(1.0 - 2.0 * t["tail_bit"], jnp.float32)
        sp = jnp.asarray(1.0 - 2.0 * t["tail_parity"], jnp.float32)
        # note LLR>0 ⇒ bit 1, so bit b contributes -(1-2b)*L/2... define
        # metric for hypothesis b: +L/2 if b==1 else -L/2 == (2b-1)*L/2
        gamma = -(sb * x + sp * z)
        nxt = t["tail_next"]
        beta = gamma + beta[..., nxt]
    return beta


def _gather_states(arr, idx_np):
    """arr (..., 8) gathered with a static numpy index (8,) or (8,2)."""
    return arr[..., jnp.asarray(idx_np)]


def map_decoder(lx, lz, lx_tail, lz_tail, k: int):
    """One constituent max-log-MAP pass.

    lx: (B, K) systematic-plus-apriori LLRs; lz: (B, K) parity LLRs;
    lx_tail, lz_tail: (B, 3) this decoder's tail LLRs.
    Returns posterior LLRs (B, K) (positive ⇒ bit 1).
    """
    t = _trellis()
    nw, lw = _window_layout(k)
    b = lx.shape[0]

    # half-metrics; hypothesis bit b contributes (2b-1) * L/2
    x = 0.5 * lx
    z = 0.5 * lz

    # per-branch sign tables
    su = np.array([-1.0, 1.0], np.float32)  # u=0 → -, u=1 → +
    sp = (2.0 * t["parity"] - 1.0).astype(np.float32)  # (8,2)
    spp = (2.0 * t["prev_parity"] - 1.0).astype(np.float32)
    spu = (2.0 * t["prev_u"] - 1.0).astype(np.float32)

    xw = x.reshape(b, nw, lw)
    zw = z.reshape(b, nw, lw)

    # --- alpha: extended windows [w*lw - T, w*lw + lw) ---
    T = min(TRAIN, lw)
    pad_x = jnp.concatenate([jnp.zeros((b, T)), x], axis=-1)
    pad_z = jnp.concatenate([jnp.zeros((b, T)), z], axis=-1)
    # gather extended windows: (B, nw, T+lw)
    starts = np.arange(nw) * lw  # window starts in padded coords
    idx = starts[:, None] + np.arange(T + lw)[None, :]
    ax = pad_x[:, idx]
    az = pad_z[:, idx]

    known_alpha0 = jnp.concatenate(
        [jnp.zeros((b, 1, 1)), jnp.full((b, 1, 7), NEG_INF)], axis=-1
    )

    prev_state = t["prev_state"]  # (8,2)

    def alpha_step(carry, inputs):
        a = carry  # (B, nw, 8)
        xt, zt, is_start = inputs  # (B,nw), (B,nw), scalar bool
        # override window 0 with known init when main region starts
        a = jnp.where(
            is_start,
            jnp.concatenate([known_alpha0, a[:, 1:, :]], axis=1),
            a,
        )
        # branch metric into next state ns via (prev_state, prev_u)
        ap = a[..., jnp.asarray(prev_state)]  # (B,nw,8,2)
        g = (
            jnp.asarray(spu) * xt[..., None, None]
            + jnp.asarray(spp) * zt[..., None, None]
        )
        new = jnp.max(ap + g, axis=-1)
        new = new - new[..., 0:1]  # renormalize (reference subtracts state 0)
        return new, a

    zero_a = jnp.zeros((b, nw, 8))
    is_start_seq = jnp.zeros(T + lw, bool).at[T].set(True)
    # seed training with uniform 0 (like reference's simd_set1(0))
    _, alphas = jax.lax.scan(
        alpha_step,
        zero_a,
        (ax.transpose(2, 0, 1), az.transpose(2, 0, 1), is_start_seq),
    )
    alpha = alphas[T:]  # (lw, B, nw, 8): alpha at main positions

    # --- beta: extended windows [w*lw, w*lw + lw + T), scanned backward ---
    pad_x2 = jnp.concatenate([x, jnp.zeros((b, T))], axis=-1)
    pad_z2 = jnp.concatenate([z, jnp.zeros((b, T))], axis=-1)
    idx2 = starts[:, None] + np.arange(lw + T)[None, :]
    bx = pad_x2[:, idx2]
    bz = pad_z2[:, idx2]

    beta_k = _beta_tail(lx_tail, lz_tail)  # (B, 8) for the last window

    next_state = t["next_state"]

    def beta_step(carry, inputs):
        bta = carry  # beta at position t+1: (B, nw, 8)
        xt, zt, is_main_edge = inputs
        bta = jnp.where(
            is_main_edge,
            jnp.concatenate([bta[:, :-1, :], beta_k[:, None, :]], axis=1),
            bta,
        )
        bn = bta[..., jnp.asarray(next_state)]  # (B,nw,8,2)
        g = (
            jnp.asarray(su) * xt[..., None, None]
            + jnp.asarray(sp) * zt[..., None, None]
        )
        new = jnp.max(bn + g, axis=-1)
        new = new - new[..., 0:1]
        return new, bta

    # reversed scan over positions lw+T-1 .. 0; the beta_k override applies
    # when stepping from the training region into the main region, i.e. when
    # computing beta at position lw-1 (reading beta at lw).
    is_edge_seq = jnp.zeros(lw + T, bool).at[lw - 1].set(True)
    _, betas_rev = jax.lax.scan(
        beta_step,
        jnp.zeros((b, nw, 8)),
        (
            bx.transpose(2, 0, 1)[::-1],
            bz.transpose(2, 0, 1)[::-1],
            is_edge_seq[::-1],
        ),
    )
    # betas_rev[i] is beta at position (lw+T-1 - i)+1... we need beta at t+1
    # for each main t: that is the carry *input* when computing position t,
    # which we stacked as the scan output. Reorder to (lw, B, nw, 8):
    beta_next = betas_rev[::-1][:lw]  # beta at t+1 for t in [0, lw)

    # --- posterior LLR ---
    # for each t: max over branches with u=1 of alpha_t(s)+gamma+beta_{t+1}(s')
    xw_t = xw.transpose(2, 0, 1)  # (lw, B, nw)
    zw_t = zw.transpose(2, 0, 1)
    bnext = beta_next[..., jnp.asarray(next_state)]  # (lw,B,nw,8,2)
    g = (
        jnp.asarray(su) * xw_t[..., None, None]
        + jnp.asarray(sp) * zw_t[..., None, None]
    )
    metric = alpha[..., None] + g + bnext  # (lw,B,nw,8,2)
    m1 = jnp.max(metric[..., 1], axis=-1)
    m0 = jnp.max(metric[..., 0], axis=-1)
    llr = (m1 - m0).transpose(1, 2, 0).reshape(b, k)
    return llr


# --- full iterative decoder ---------------------------------------------------


@lru_cache(maxsize=256)
def _perm_tables(k: int):
    per = qpp_interleaver_np(k)
    inv = np.empty_like(per)
    inv[per] = np.arange(k, dtype=per.dtype)
    return per, inv


def dstream_tails(d_tail):
    """Split d-stream tail LLRs (B, 3, 4) into per-decoder tail LLRs.

    Returns (lx1, lz1, lx2, lz2), each (B, 3), inverting the TS 36.212 tail
    distribution used in `turbo_encode_np`.
    """
    d0, d1, d2 = d_tail[:, 0], d_tail[:, 1], d_tail[:, 2]
    lx1 = jnp.stack([d0[:, 0], d2[:, 0], d1[:, 1]], axis=-1)  # x_K, x_K+1, x_K+2
    lz1 = jnp.stack([d1[:, 0], d0[:, 1], d2[:, 1]], axis=-1)  # z_K, z_K+1, z_K+2
    lx2 = jnp.stack([d0[:, 2], d2[:, 2], d1[:, 3]], axis=-1)
    lz2 = jnp.stack([d1[:, 2], d0[:, 3], d2[:, 3]], axis=-1)
    return lx1, lz1, lx2, lz2


@partial(jax.jit, static_argnames=("k", "max_iterations"))
def turbo_decode(d_llr, k: int, max_iterations: int = 5, crc_table=None):
    """Iteratively decode a batch of codeblocks.

    d_llr: (B, 3, K+4) float32 LLRs in d-stream layout (positive ⇒ bit 1) —
    the natural output of the rate dematcher.
    crc_table: optional (K-24→unused) — if given (shape (K, 24) float32 CRC
    matrix, CRC24B over the whole K including its trailing CRC), iterations
    stop early once every CB in the batch passes CRC (mirrors sch.c:419-450).
    Returns (bits (B, K) uint8, llr (B, K) float32, n_iterations int32).
    """
    b = d_llr.shape[0]
    per, inv = _perm_tables(k)
    per_j, inv_j = jnp.asarray(per), jnp.asarray(inv)

    sys = d_llr[:, 0, :k]
    p1 = d_llr[:, 1, :k]
    p2 = d_llr[:, 2, :k]
    lx1_t, lz1_t, lx2_t, lz2_t = dstream_tails(d_llr[:, :, k:])
    sys_int = sys[:, per_j]

    def one_iteration(ext2):
        post1 = map_decoder(sys + ext2, p1, lx1_t, lz1_t, k)
        ext1 = post1 - (sys + ext2)
        in2 = sys_int + ext1[:, per_j]
        post2 = map_decoder(in2, p2, lx2_t, lz2_t, k)
        ext2_int = post2 - in2
        new_ext2 = ext2_int[:, inv_j]
        return new_ext2, post2[:, inv_j]

    def crc_pass(post):
        if crc_table is None:
            return jnp.zeros((b,), bool)
        bits = (post > 0).astype(jnp.float32)
        acc = jnp.matmul(bits, crc_table, preferred_element_type=jnp.float32)
        return jnp.all((acc.astype(jnp.int32) & 1) == 0, axis=-1)

    def cond(state):
        i, ext2, post, done = state
        return jnp.logical_and(i < max_iterations, jnp.logical_not(jnp.all(done)))

    def body(state):
        i, ext2, post, done = state
        new_ext2, new_post = one_iteration(ext2)
        # freeze converged codeblocks
        new_ext2 = jnp.where(done[:, None], ext2, new_ext2)
        new_post = jnp.where(done[:, None], post, new_post)
        return i + 1, new_ext2, new_post, jnp.logical_or(done, crc_pass(new_post))

    init = (
        jnp.int32(0),
        jnp.zeros((b, k)),
        jnp.zeros((b, k)),
        jnp.zeros((b,), bool),
    )
    n_it, _, post, _ = jax.lax.while_loop(cond, body, init)
    return (post > 0).astype(jnp.uint8), post, n_it
