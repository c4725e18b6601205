"""One-pass Pallas TPU front end: scatterers -> detections + signatures.

Round 3 removed the ADC and RDS cubes from HBM (``synthpower_pallas.py``)
but still ran the front end as THREE dispatches -- power kernel, XLA
CFAR/top-K detection, signature kernel -- with two structural costs the
round-3 verdict called out (VERDICT r03 next-items 1 and 2):

- the seeded Mosaic PRNG + Box-Muller noise stream was generated TWICE
  (once per kernel, ~377 us/64-frame batch each) so that AoA sees exactly
  the noise detection saw, and the synthesis matmul + range DFT ran
  twice;
- the detection stage re-read the power map the kernel had just written
  and moved ~410 MB/batch of CFAR intermediates (573 us at 92% of its own
  -- self-inflicted -- bytes bound).

This kernel runs synthesis + AWGN (drawn ONCE) + range DFT + Doppler DFT
+ |.|^2 + antenna mean + CA-CFAR + local-max + gates in one VMEM-resident
program per frame, and hands downstream a *sufficient statistic* instead
of re-deriving it: the range-DFT'd matrix Z = x @ W_rng ([A*C, S]
complex, 819 KB/frame -- 8x smaller than the ADC cube whose round-3
elimination still stands).  Spatial signatures are then EXACT column
gathers of Z (`signature[k, a] = sum_c w_dop[c, d_k] * Z[aC+c, r_k]`,
the identical math ``signal/rds.py:detection_signatures`` evaluates from
the raw cube), so noise identity between detection and AoA is structural
-- both read the same Z -- rather than a seed-replay protocol.

Top-K selection stays in XLA (``lax.top_k`` on the kernel's masked score
map): the r04a in-kernel iterative-argmax variant was measured at
1,541 us/64 frames -- 64 sequential full-map reductions on the VPU --
versus ~100 us for XLA's selection; dropping cross-dispatch traffic is a
win only when the replacement compute is actually cheaper.  CA-CFAR box
sums ride the MXU as banded 0/1-matrix matmuls (``B_d @ p @ B_s``, 20
MFLOP/frame) and replicate ``signal/detect.py:_threshold_power``
(ca branch) exactly up to f32 summation order.

Replaces the reference chain ``scripts/simulate_raw.py:171-209`` +
``src/radar_signal/dechirp.py:168-271`` (synthesis -> RDS -> peak
extraction) + the signature gather of ``angle_estimation.py:83-90`` for
the synthetic path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_slam_tpu.ops.power_pallas import _doppler_power, _mm_bf16
from radar_slam_tpu.ops.rds_pallas import _cmm, _mm_bf16x3, _mm_f32
from radar_slam_tpu.ops.synthpower_pallas import (_standard_normals,
                                                  _synth_xy)

_MMS = {"default": _mm_bf16, "high": _mm_bf16x3, "highest": _mm_f32}

_TWO_PI = 6.283185307179586
_NEG = -1e30          # score sentinel; power_db >= -120 so -1e29 separates
_LOG10E_10 = 4.3429448190325176   # 10 / ln(10)


def _log10_db(x):
    return jnp.log(x) * jnp.float32(_LOG10E_10)


def _shift2(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """x shifted so result[c, s] = x[c - dy, s - dx], zero-filled."""
    C, S = x.shape
    if dy > 0:
        x = jnp.concatenate([jnp.zeros((dy, S), x.dtype), x[:-dy]], axis=0)
    elif dy < 0:
        x = jnp.concatenate([x[-dy:], jnp.zeros((-dy, S), x.dtype)], axis=0)
    if dx > 0:
        x = jnp.concatenate([jnp.zeros((C, dx), x.dtype), x[:, :-dx]],
                            axis=1)
    elif dx < 0:
        x = jnp.concatenate([x[:, -dx:], jnp.zeros((C, -dx), x.dtype)],
                            axis=1)
    return x


def _window_counts(shape, dim: int, pad: int) -> jax.Array:
    """Per-index valid sample count of a centered width-(2*pad+1) window
    clipped to [0, n) (``signal/detect.py:_box_mean2d`` counts), built as
    a 2-D plane: Mosaic's iota is integer-only and 2-D-only."""
    n = shape[dim]
    i = jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)
    return (jnp.minimum(i + pad, n - 1) - jnp.maximum(i - pad, 0) + 1.0)


def _cumsum_axis(x: jax.Array, axis: int) -> jax.Array:
    """Inclusive prefix sum along ``axis`` via log-shift adds (zero-fill
    ``_shift2`` shifts): ceil(log2(n)) shifted adds on the VPU, no MXU."""
    n = x.shape[axis]
    sh = 1
    while sh < n:
        x = x + (_shift2(x, sh, 0) if axis == 0 else _shift2(x, 0, sh))
        sh *= 2
    return x


def _box_from_cumsum(cs: jax.Array, axis: int, pad: int) -> jax.Array:
    """Clipped-window box sum from an inclusive prefix sum:
    box[i] = cs[min(i+pad, n-1)] - (cs[i-pad-1] if i-pad-1 >= 0 else 0),
    exactly the band-matrix window (clipped to [0, n))."""
    n = cs.shape[axis]
    i = jax.lax.broadcasted_iota(jnp.int32, cs.shape, axis)
    hi = _shift2(cs, -pad, 0) if axis == 0 else _shift2(cs, 0, -pad)
    # The zero-filled tail (i + pad >= n) must read cs[n-1] instead.
    last = (cs[n - 1:n, :] if axis == 0 else cs[:, n - 1:n])
    hi = jnp.where(i + pad > n - 1, last, hi)
    lo = _shift2(cs, pad + 1, 0) if axis == 0 else _shift2(cs, 0, pad + 1)
    return hi - lo


def _cfar_threshold_cumsum(p1, *, train: int, guard: int, offset_db: float,
                           threshold_db: float, C: int, S: int):
    """CA-CFAR threshold map via separable prefix-sum differencing: the
    band matmuls of ``_cfar_threshold`` cost ~33M effective MAC/frame at
    bf16x3 (3 MXU passes each); the same clipped box sums are
    O((C+S) log) zero-fill shifts + adds on the VPU, in EXACT f32 --
    numerically closer to the XLA ``reduce_window`` reference than the
    bf16x3 matmul form (cancellation bound: prefix magnitude / box
    magnitude ~ S/width ulps, ~2e-6 relative here)."""
    if train <= 0:
        return jnp.full((C, S), jnp.float32(threshold_db))
    train_w = 2 * train + 2 * guard + 1
    guard_w = 2 * guard + 1

    cnt_d = _window_counts((C, 1), 0, train_w // 2)         # [C, 1]
    cnt_s = _window_counts((1, S), 1, train_w // 2)         # [1, S]
    cs_d = _cumsum_axis(p1, 0)
    sum_d = _box_from_cumsum(cs_d, 0, train_w // 2)         # rows
    sum_t = _box_from_cumsum(_cumsum_axis(sum_d, 1), 1, train_w // 2)
    noise = sum_t / (cnt_d * cnt_s)
    if guard > 0:
        cnt_dg = _window_counts((C, 1), 0, guard_w // 2)
        cnt_sg = _window_counts((1, S), 1, guard_w // 2)
        sum_dg = _box_from_cumsum(cs_d, 0, guard_w // 2)
        g = (_box_from_cumsum(_cumsum_axis(sum_dg, 1), 1, guard_w // 2)
             / (cnt_dg * cnt_sg))
        n_train = float(train_w * train_w)
        n_guard = float(guard_w * guard_w)
        noise = (noise * n_train - g * n_guard) / (n_train - n_guard)
    noise_db = _log10_db(jnp.maximum(noise, 1e-12))
    return jnp.maximum(noise_db + jnp.float32(offset_db),
                       jnp.float32(threshold_db))


def _cfar_threshold(p1, bs_t, bd_t, bs_g, bd_g, *, train: int, guard: int,
                    offset_db: float, threshold_db: float, C: int, S: int):
    """CA-CFAR threshold map [C, S] via banded-matmul box means; replica
    of ``signal/detect.py:_threshold_power`` (ca branch) up to bf16x3
    (~1e-7 rel) box-sum accumulation and natural-log vs log10 dB
    evaluation -- borderline threshold crossings can differ between this
    and the XLA path, which is why the equivalence tests compare detected
    SETS at tolerance rather than bitwise masks."""
    if train <= 0:
        return jnp.full((C, S), jnp.float32(threshold_db))
    train_w = 2 * train + 2 * guard + 1
    guard_w = 2 * guard + 1

    # Box sums: rows (Doppler axis) then columns (range axis); division by
    # the per-cell valid count is the closed-form outer product.  bf16x3
    # matmuls (~1e-7 relative) instead of Mosaic's 6-pass f32: the banded
    # sums feed a threshold with a 12 dB offset margin, and the 6-pass
    # path cost ~150 us/64-frame batch of the kernel's budget.
    cnt_d = _window_counts((C, 1), 0, train_w // 2)         # [C, 1]
    cnt_s = _window_counts((1, S), 1, train_w // 2)         # [1, S]
    sum_t = _mm_bf16x3(_mm_bf16x3(bd_t, p1), bs_t)
    noise = sum_t / (cnt_d * cnt_s)
    if guard > 0:
        cnt_dg = _window_counts((C, 1), 0, guard_w // 2)
        cnt_sg = _window_counts((1, S), 1, guard_w // 2)
        g = _mm_bf16x3(_mm_bf16x3(bd_g, p1), bs_g) / (cnt_dg * cnt_sg)
        n_train = float(train_w * train_w)
        n_guard = float(guard_w * guard_w)
        noise = (noise * n_train - g * n_guard) / (n_train - n_guard)
    noise_db = _log10_db(jnp.maximum(noise, 1e-12))
    return jnp.maximum(noise_db + jnp.float32(offset_db),
                       jnp.float32(threshold_db))


def _frontend_body(eatr, eati, efr, efi, seed,
                   wrr_ref, wri_ref, wdtr_ref, wdti_ref,
                   bs_t_ref, bd_t_ref, bs_g_ref, bd_g_ref, gate_ref,
                   refs,
                   A: int, C: int, sigma: float,
                   train: int, guard: int, neighborhood: int,
                   offset_db: float, threshold_db: float,
                   clutter_offset_db: float, has_clutter: bool,
                   synth_precision: str, z_precision: str,
                   doppler_precision: str, doppler_layout: str,
                   noise_impl: str, noise_domain: str,
                   noise_taps: tuple, dc_removal: bool,
                   cfar_impl: str = "matmul"):
    """Shared kernel body: factors (already VMEM values) -> Z + power +
    CFAR score map.  Called by the dense- and split-factor kernels."""
    if has_clutter:
        clut_ref = refs[0]
        refs = refs[1:]
    (zr_ref, zi_ref, p_ref, score_ref) = refs

    if noise_domain == "range_freq":
        # ---- spectral-domain construction (r05) -------------------------
        # Z_signal = e_ac^T @ (e_fast @ diag(mix) W): with the noise OUT
        # of the time domain, the synthesis->DFT chain reassociates so
        # the [AC, S] @ [S, S] range DFT of the materialized cube (41
        # MMAC, the kernel's largest matmul) becomes [Sc, S] @ [S, S] +
        # [AC, Sc] @ [Sc, S] (33.6 MMAC total) -- measured 769 -> 326
        # us/64f for the Z chain.  wrr/wri hold the SAME mix-and-dc
        # folded constant as the time branch (mix commutes into it), so
        # the in-kernel dc zeroing below only matters for the noise.
        #
        # Noise enters directly in range-frequency: for iid time noise n,
        # DFT(n . w_periodic) =d sqrt(S) * (g (*) taps) with g iid -- the
        # windowing is an exact 3-tap (Hann) circular convolution instead
        # of a matmul.  Deviation: the noise is shaped by the PERIODIC
        # window variant while the signal keeps the symmetric one (they
        # differ by O(1/S) per sample; the noise covariance changes by
        # <0.4% -- measured invisible in every accuracy gate).
        tr, ti = _cmm(efr, efi, wrr_ref[:], wri_ref[:],
                      _MMS[synth_precision])
        zr, zi = _cmm(eatr, eati, tr, ti, _MMS[z_precision])
        pltpu.prng_seed(seed)
        gr, gi = _standard_normals(zr.shape, noise_impl)
        sn = jnp.float32(sigma * float(zr.shape[1]) ** 0.5)

        def conv(g):
            acc = None
            for off, cc in noise_taps:
                sh = (g if off == 0 else jnp.concatenate(
                    [g[:, -off:], g[:, :-off]], axis=1))
                term = jnp.float32(cc) * sh
                acc = term if acc is None else acc + term
            return acc

        zr = zr + sn * conv(gr)
        zi = zi + sn * conv(gi)
        if dc_removal:
            col = jax.lax.broadcasted_iota(jnp.int32, zr.shape, 1)
            zr = jnp.where(col == 0, 0.0, zr)
            zi = jnp.where(col == 0, 0.0, zi)
    else:
        # ---- time-domain construction (r04): synthesis (+ noise, drawn
        # ONCE) + range DFT of the materialized-in-VMEM cube --------------
        xr, xi = _synth_xy(eatr, eati, efr, efi, seed, sigma,
                           _MMS[synth_precision], noise_impl)
        zr, zi = _cmm(xr, xi, wrr_ref[:], wri_ref[:], _MMS[z_precision])
    # Z is written TRANSPOSED [S, A*C]: the XLA column gather downstream
    # wants the antenna-chirp axis minor and otherwise inserts two
    # full-plane relayout copies (~180 us/64f traced).  The relayout is
    # expressed as per-antenna [C, S] -> [S, C] transposes + lane concat
    # (the rds_pallas pattern; Mosaic rejects one big 2-D transpose less
    # predictably than these block forms).
    zr_ref[0] = jnp.concatenate(
        [zr[a * C:(a + 1) * C, :].T for a in range(A)], axis=1)
    zi_ref[0] = jnp.concatenate(
        [zi[a * C:(a + 1) * C, :].T for a in range(A)], axis=1)

    # ---- Doppler power --------------------------------------------------
    acc = _doppler_power(zr, zi, wdtr_ref[:], wdti_ref[:], A, C,
                         _MMS[doppler_precision], doppler_layout)
    p = acc * jnp.float32(1.0 / A)                          # [C(D), S(R)]
    p_ref[0] = p
    S = p.shape[1]

    # ---- detection mask: CFAR + local max + gates -----------------------
    p1 = p + jnp.float32(1e-12)
    pd = _log10_db(p1)
    if cfar_impl == "cumsum":
        thresh = _cfar_threshold_cumsum(
            p1, train=train, guard=guard, offset_db=offset_db,
            threshold_db=threshold_db, C=C, S=S)
    else:
        thresh = _cfar_threshold(p1, bs_t_ref[:], bd_t_ref[:], bs_g_ref[:],
                                 bd_g_ref[:], train=train, guard=guard,
                                 offset_db=offset_db,
                                 threshold_db=threshold_db, C=C, S=S)
    r = neighborhood // 2
    is_peak = jnp.full(p1.shape, True)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            is_peak = is_peak & (p1 >= _shift2(p1, dy, dx))
    mask = is_peak & (pd > thresh) & (gate_ref[:] > 0.0)
    if has_clutter:
        cd = _log10_db(jnp.maximum(clut_ref[0], 1e-12))
        mask = mask & (pd > cd + jnp.float32(clutter_offset_db))
    score_ref[0] = jnp.where(mask, pd, jnp.float32(_NEG))


def _frontend_kernel(seed_ref, eatr_ref, eati_ref, efr_ref, efi_ref,
                     wrr_ref, wri_ref, wdtr_ref, wdti_ref,
                     bs_t_ref, bd_t_ref, bs_g_ref, bd_g_ref, gate_ref,
                     *refs, **statics):
    """Dense-factor kernel: e_ac^T / e_fast arrive materialized."""
    _frontend_body(eatr_ref[0], eati_ref[0], efr_ref[0], efi_ref[0],
                   seed_ref[pl.program_id(0)],
                   wrr_ref, wri_ref, wdtr_ref, wdti_ref,
                   bs_t_ref, bd_t_ref, bs_g_ref, bd_g_ref, gate_ref,
                   refs, **statics)


def _frontend_kernel_split(seed_ref, antr_ref, anti_ref, dopr_ref, dopi_ref,
                           cor_ref, coi_ref, fir_ref, fii_ref, tau_ref,
                           tvec_ref,
                           wrr_ref, wri_ref, wdtr_ref, wdti_ref,
                           bs_t_ref, bd_t_ref, bs_g_ref, bd_g_ref, gate_ref,
                           *refs, echo_upper, S: int, **statics):
    """Split-factor kernel: recompose e_at [AC, Sc] and e_fast [Sc, S] in
    VMEM from the per-axis tables (``signal/synth.py:SplitFactors``) --
    ~5x less HBM input per frame and ~3x fewer host-side exps than the
    dense layout.

    e_at rows a*C+c are row-broadcast complex products dopp_T * ant_T[a];
    e_fast block q (lane-register-width B = 128 columns) is the
    column-broadcast complex product coarse[:, q] * fine -- a first cut
    expanded via 0/1 selection matmuls (B = 16), whose [*, 16/25]-class
    K dimensions cost ~90 us/64f of MXU pass overhead and measured a
    wash e2e; B = 128 makes the concat seams register-aligned and the
    composition pure VPU broadcast multiplies.  The echo gate
    [t_s >= tau_sc] (and the reference-fidelity upper gate
    t_s - tau_sc <= T) is re-evaluated here on the same t vector the
    host builds, so the mask matches ``synthesis_factors`` bitwise.
    """
    A = statics["A"]
    dopr, dopi = dopr_ref[0], dopi_ref[0]               # [C, Sc]
    antr, anti = antr_ref[0], anti_ref[0]               # [A, Sc]
    eatr_b, eati_b = [], []
    for a in range(A):
        ar, ai = antr[a:a + 1, :], anti[a:a + 1, :]     # [1, Sc] broadcast
        eatr_b.append(dopr * ar - dopi * ai)
        eati_b.append(dopr * ai + dopi * ar)
    eatr = jnp.concatenate(eatr_b, axis=0)              # [AC, Sc]
    eati = jnp.concatenate(eati_b, axis=0)

    cor, coi = cor_ref[0], coi_ref[0]                   # [Sc, Q]
    fir, fii = fir_ref[0], fii_ref[0]                   # [Sc, B]
    B = fir.shape[1]
    Q = cor.shape[1]
    er_b, ei_b = [], []
    for q in range(Q):
        cr, ci = cor[:, q:q + 1], coi[:, q:q + 1]       # [Sc, 1] broadcast
        w = min(B, S - q * B)                           # tail block width
        fr_, fi_ = fir[:, :w], fii[:, :w]
        er_b.append(cr * fr_ - ci * fi_)                # [Sc, w]
        ei_b.append(cr * fi_ + ci * fr_)
    efr = er_b[0] if Q == 1 else jnp.concatenate(er_b, axis=1)
    efi = ei_b[0] if Q == 1 else jnp.concatenate(ei_b, axis=1)
    tvec, tau = tvec_ref[:], tau_ref[0]                 # [1, S], [Sc, 1]
    arrived = (tvec >= tau).astype(jnp.float32)
    if echo_upper is not None:
        arrived = arrived * (tvec - tau
                             <= jnp.float32(echo_upper)).astype(jnp.float32)
    _frontend_body(eatr, eati, efr * arrived, efi * arrived,
                   seed_ref[pl.program_id(0)],
                   wrr_ref, wri_ref, wdtr_ref, wdti_ref,
                   bs_t_ref, bd_t_ref, bs_g_ref, bd_g_ref, gate_ref,
                   refs, **statics)


def _band(n: int, half: int) -> jax.Array:
    i = jnp.arange(n)
    return (jnp.abs(i[:, None] - i[None, :]) <= half).astype(jnp.float32)


def topk_two_stage(score: jax.Array, K: int,
                   seg: int = 512) -> Tuple[jax.Array, jax.Array]:
    """Exact top-K over the last axis via segmented selection.

    ``lax.top_k`` on [F, 12800] lowers to a full sort -- traced at
    880 us/64-frame batch, nearly the cost of the whole front-end kernel
    (``scripts/trace_batched.py``, r04).  Splitting into ``seg``-wide
    segments, taking top-K per segment, then top-K of the G*K segment
    winners is EXACT for K <= seg (at most K global winners exist, so no
    segment can hide one below its own top-K) and preserves lax.top_k's
    tie order: within a segment ties keep index order, and across
    segments a stage-2 tie resolves to the smaller (segment, rank) pair,
    i.e. the smaller global index.

    ``seg`` default from a chip sweep at the production shape
    ([64, 12800], K = 64): seg 128/256/512/800 chained at
    498/390/286/348 us vs lax.top_k 374 us -- seg = 128 made stage 1 a
    near-full sort of every segment (K = seg/2) and stage 2 a 6,400-wide
    sort; 512 balances the two (25 segments, 1,600-wide stage 2).

    Returns (values [F, K], flat indices [F, K])."""
    if K > seg:
        return jax.lax.top_k(score, K)
    F, N = score.shape
    G = -(-N // seg)
    if G * seg != N:
        score = jnp.pad(score, ((0, 0), (0, G * seg - N)),
                        constant_values=-jnp.inf)
    v1, i1 = jax.lax.top_k(score.reshape(F, G, seg), K)     # [F, G, K]
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (F, G, K), 1) * seg
            + i1.astype(jnp.int32))
    v2, i2 = jax.lax.top_k(v1.reshape(F, G * K), K)
    idx = jnp.take_along_axis(gidx.reshape(F, G * K), i2, axis=1)
    return v2, idx


def _common_consts(C: int, S: int, mix, dc_removal: bool,
                   doppler_window, train: int, guard: int,
                   min_range_bin: int, max_range_bin: int):
    """Frame-independent kernel inputs shared by the dense- and
    split-factor wrappers: folded range-DFT constant, Doppler DFT^T,
    CFAR band matrices, range gate.  Returns (operands, specs)."""
    from radar_slam_tpu.signal.rds import doppler_dft_matrix, range_dft_matrix

    w_rng = range_dft_matrix(S, mix, dc_removal)
    w_dop_t = doppler_dft_matrix(C, doppler_window).T
    train_w = 2 * train + 2 * guard + 1
    guard_w = 2 * guard + 1
    bs_t = _band(S, train_w // 2)
    bd_t = _band(C, train_w // 2)
    bs_g = _band(S, guard_w // 2) if guard > 0 else jnp.zeros((S, S),
                                                             jnp.float32)
    bd_g = _band(C, guard_w // 2) if guard > 0 else jnp.zeros((C, C),
                                                              jnp.float32)
    s = jnp.arange(S)
    gate = (((s >= min_range_bin) & (s <= max_range_bin))
            .astype(jnp.float32)[None, :])                  # [1, S]
    const = lambda shape: pl.BlockSpec(
        shape, lambda f: (0,) * len(shape), memory_space=pltpu.VMEM)
    operands = [jnp.real(w_rng).astype(jnp.float32),
                jnp.imag(w_rng).astype(jnp.float32),
                jnp.real(w_dop_t).astype(jnp.float32),
                jnp.imag(w_dop_t).astype(jnp.float32),
                bs_t, bd_t, bs_g, bd_g, gate]
    specs = [const((S, S)), const((S, S)), const((C, C)), const((C, C)),
             const((S, S)), const((C, C)), const((S, S)), const((C, C)),
             const((1, S))]
    return operands, specs


def _finalize(zr, zi, p_ds, score_ds, K: int, A: int, C: int,
              doppler_window, topk_mode: str):
    """XLA tail on the kernel's outputs: top-K selection on the masked
    score map + signatures as exact Z-column gathers (see the docstring
    of ``scatterer_frontend`` for the measured design rationale)."""
    from radar_slam_tpu.signal.rds import get_window

    F = p_ds.shape[0]
    S = zr.shape[1]
    p_lin = jnp.swapaxes(p_ds, -1, -2)                      # [F, R, D]
    score = jnp.swapaxes(score_ds, -1, -2).reshape(F, S * C)
    if topk_mode == "two_stage":
        vals, idx = topk_two_stage(score, K)                # [F, K]
    else:
        vals, idx = jax.lax.top_k(score, K)                 # [F, K]
    rb = (idx // C).astype(jnp.int32)
    db = (idx % C).astype(jnp.int32)
    valid = vals > jnp.float32(_NEG * 0.1)
    vals = jnp.where(valid, vals, -jnp.inf)

    # signature[f, k, a] = sum_c w_dop[c, f(d_k)] * Z[f, r_k, a*C+c]
    # -- EXACTLY detection_signatures' math, with Z's rows gathered
    # instead of recomputed (the Doppler column d of doppler_dft_matrix is
    # window * e^{-2j pi c f(d) / C}, f(d) = (d - C//2) mod C).  The
    # kernel emits Z transposed so the gathered axis is major and the
    # re/im planes are gathered separately: materializing complex Z (or
    # letting XLA relayout it for the gather) cost full-plane copies.
    rbk = rb[:, :, None]
    zcols = (jnp.take_along_axis(zr, rbk, axis=1)
             + 1j * jnp.take_along_axis(zi, rbk, axis=1)
             ).astype(jnp.complex64)                        # [F, K, AC]
    zcols = zcols.reshape(F, K, A, C)
    c_idx = jnp.arange(C, dtype=jnp.float32)
    f_shift = jnp.mod(db - C // 2, C).astype(jnp.float32)   # [F, K]
    w_dop = jnp.exp(-1j * (2.0 * jnp.pi / C)
                    * c_idx[None, :, None] * f_shift[:, None, :])
    if doppler_window is not None:
        wd = get_window(doppler_window, C).astype(jnp.float32)
        w_dop = wd[None, :, None] * w_dop
    sig = jnp.einsum("fkac,fck->fka", zcols,
                     w_dop.astype(jnp.complex64),
                     precision=jax.lax.Precision.HIGHEST)   # [F, K, A]
    power = jnp.sum(jnp.abs(sig) ** 2, axis=-1, keepdims=True)
    sig = jnp.where(power > 0,
                    sig / jnp.sqrt(jnp.maximum(power, 1e-30)), sig)
    return p_lin, rb, db, vals, sig.astype(jnp.complex64)


@functools.partial(
    jax.jit,
    static_argnames=("C", "K", "sigma", "dc_removal", "doppler_window",
                     "train", "guard", "neighborhood", "offset_db",
                     "threshold_db", "clutter_offset_db", "min_range_bin",
                     "max_range_bin", "synth_precision", "precision_name",
                     "doppler_precision", "doppler_layout", "sig_precision",
                     "noise_impl", "topk_mode", "noise_domain",
                     "noise_taps", "cfar_impl"))
def scatterer_frontend(
        e_ac: jax.Array, e_fast: jax.Array, seeds: jax.Array,
        mix: jax.Array, C: int, sigma: float, K: int,
        *, train: int, guard: int, neighborhood: int, offset_db: float,
        threshold_db: float, min_range_bin: int, max_range_bin: int,
        clutter: Optional[jax.Array] = None,
        clutter_offset_db: float = 6.0,
        dc_removal: bool = True, doppler_window: Optional[str] = None,
        synth_precision: str = "high", precision_name: str = "default",
        doppler_precision: str = "high", doppler_layout: str = "loop",
        sig_precision: str = "high", noise_impl: str = "box_muller",
        topk_mode: str = "sort", noise_domain: str = "time",
        noise_taps: tuple = (), cfar_impl: str = "matmul",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """The one-pass front end over a frame batch.

    Args:
        e_ac / e_fast: [F, Sc, A*C] / [F, Sc, S] complex64 synthesis
            factors (``signal/synth.py:synthesis_factors``, vmapped).
        seeds: [F] int32 per-frame noise seeds (same stream as
            ``synthpower_pallas.noise_cube`` -- the validation surface).
        mix: [S] complex64 dechirp x fast-time window vector.
        K: detection capacity (``DetectionConfig.max_detections``).
        train/guard/neighborhood/offset_db/threshold_db: CA-CFAR + local
            max parameters (``DetectionConfig``; ``train=0`` = fixed
            threshold).
        min_range_bin / max_range_bin: inclusive range-gate bin interval
            (precomputed from ``range_axis_m`` by the caller so the gate
            matches ``signal/detect.py:_finalize_detections`` exactly).
        clutter: optional [F, R, D] EMA background power map (linear);
            cells must exceed it by ``clutter_offset_db`` dB.
        sig_precision: MXU precision of the Z range DFT ("high" = bf16x3,
            f32-accurate).  Z feeds BOTH the power map and the signature
            gathers, so this replaces the three-dispatch path's separate
            ``precision_name`` (power, bf16) / ``sig_precision`` pair at
            the higher of the two; ``precision_name`` is accepted for
            interface parity but Z wins.

    Returns:
        (p_lin [F, R, D] f32, r_bin [F, K] i32, d_bin [F, K] i32,
         top_vals_db [F, K] f32 with -inf for exhausted slots,
         signatures [F, K, A] complex64 unit-power).
        Bins are RAW picks (pre-NMS, pre-zeroing); feed them to
        ``signal/detect.py:detections_from_topk``.
    """
    F, Sc, AC = e_ac.shape
    S = e_fast.shape[-1]
    A = AC // C

    eat = jnp.swapaxes(e_ac, -1, -2)
    eatr, eati = jnp.real(eat), jnp.imag(eat)
    # Both domains use the SAME mix-and-dc-folded DFT constant: for the
    # spectral branch the mix commutes into the [S, S] matrix
    # ((e_fast . mix) @ W == e_fast @ (diag(mix) W)), so no per-frame
    # elementwise scaling is needed -- a first cut scaled e_fast in XLA
    # and the trace showed it as a 1,094 us/512f multiply_add_fusion
    # moving ~210 MB of HBM.  The in-kernel dc column zeroing then only
    # has to cover the NOISE (the signal's col 0 is already zero).
    if noise_domain == "range_freq" and not noise_taps:
        raise ValueError("noise_domain='range_freq' needs the window's "
                         "noise_taps (ops/windows.py:window_freq_taps)")
    efr, efi = jnp.real(e_fast), jnp.imag(e_fast)
    c_ops, c_specs = _common_consts(C, S, mix, dc_removal, doppler_window,
                                    train, guard, min_range_bin,
                                    max_range_bin)

    fr = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda f: (f,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [seed_spec, fr((AC, Sc)), fr((AC, Sc)), fr((Sc, S)),
                fr((Sc, S))] + c_specs
    operands = [seeds.astype(jnp.int32), eatr, eati, efr, efi] + c_ops
    has_clutter = clutter is not None
    if has_clutter:
        in_specs.append(fr((C, S)))
        operands.append(jnp.swapaxes(clutter, -1, -2)
                        .astype(jnp.float32))               # [F, D, R]

    kc = lambda shape, dt: jax.ShapeDtypeStruct((F,) + shape, dt)
    zr, zi, p_ds, score_ds = pl.pallas_call(
        functools.partial(
            _frontend_kernel, A=A, C=C, sigma=sigma, train=train,
            guard=guard, neighborhood=neighborhood, offset_db=offset_db,
            threshold_db=threshold_db, clutter_offset_db=clutter_offset_db,
            has_clutter=has_clutter, synth_precision=synth_precision,
            z_precision=sig_precision,
            doppler_precision=doppler_precision,
            doppler_layout=doppler_layout, noise_impl=noise_impl,
            noise_domain=noise_domain, noise_taps=noise_taps,
            dc_removal=dc_removal, cfar_impl=cfar_impl),
        grid=(F,),
        in_specs=in_specs,
        out_specs=(fr((S, AC)), fr((S, AC)), fr((C, S)), fr((C, S))),
        out_shape=(kc((S, AC), jnp.float32), kc((S, AC), jnp.float32),
                   kc((C, S), jnp.float32), kc((C, S), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=F * ((  # spectral: T = ef' W then eat T (both bf16x3);
                          # time: synth (bf16x3) + range DFT (bf16x3)
                18 * Sc * S * S + 18 * AC * Sc * S
                if noise_domain == "range_freq"
                else 18 * AC * Sc * S + 18 * AC * S * S)
                       + 6 * AC * S * C       # Doppler DFT
                       + 4 * AC * S           # power + mean
                       + 4 * C * S * (S + C)),  # CFAR band matmuls
            bytes_accessed=F * (2 * AC * Sc * 4 + 2 * Sc * S * 4
                                + 2 * AC * S * 4 + 2 * C * S * 4),
            transcendentals=F * (4 * AC * S + 2 * C * S)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)

    # Selection + signatures in XLA on the kernel's outputs.  Selection:
    # plain lax.top_k by default at r04; its full-sort lowering traced at
    # ~880 us/64f, and the segmented-exact topk_two_stage flipped from a
    # measured e2e loss (r04b: 15.8k vs 16.3k fps) to a measured e2e win
    # (r05c: +3.4% median, four of four interleaved one-process trials)
    # as the surrounding program got faster -- config knob
    # ``PipelineConfig.frontend_topk`` carries the current default.
    return _finalize(zr, zi, p_ds, score_ds, K, A, C, doppler_window,
                     topk_mode)


@functools.partial(
    jax.jit,
    static_argnames=("C", "K", "sigma", "dc_removal", "doppler_window",
                     "train", "guard", "neighborhood", "offset_db",
                     "threshold_db", "clutter_offset_db", "min_range_bin",
                     "max_range_bin", "synth_precision",
                     "doppler_precision", "doppler_layout", "sig_precision",
                     "noise_impl", "topk_mode", "noise_domain",
                     "noise_taps", "echo_upper", "cfar_impl"))
def scatterer_frontend_split(
        ant: jax.Array, dopp: jax.Array, coarse: jax.Array,
        fine: jax.Array, tau: jax.Array, t: jax.Array, seeds: jax.Array,
        mix: jax.Array, C: int, sigma: float, K: int,
        *, train: int, guard: int, neighborhood: int, offset_db: float,
        threshold_db: float, min_range_bin: int, max_range_bin: int,
        clutter: Optional[jax.Array] = None,
        clutter_offset_db: float = 6.0,
        dc_removal: bool = True, doppler_window: Optional[str] = None,
        synth_precision: str = "high",
        doppler_precision: str = "high", doppler_layout: str = "loop",
        sig_precision: str = "high", noise_impl: str = "box_muller",
        topk_mode: str = "sort", noise_domain: str = "time",
        noise_taps: tuple = (), echo_upper: Optional[float] = None,
        cfar_impl: str = "matmul",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """``scatterer_frontend`` fed SPLIT synthesis factors
    (``signal/synth.py:synthesis_factors_split``): the kernel recomposes
    e_ac^T and e_fast in VMEM from per-axis tables instead of reading the
    materialized [Sc, A*C] + [Sc, S] complex planes from HBM.

    Per frame the factor input drops from (AC + S) * Sc complex values to
    (A + C + Q + B) * Sc + Sc (~3.4x at the production operating point,
    B = 128) and the host-side transcendental count from Sc * (S + AC)
    exp-cycle evaluations to Sc * (S/B + B + A + C) -- the factor stage
    the r05 trace put at ~8% of the whole batched step.

    Args (beyond ``scatterer_frontend``):
        ant/dopp/coarse/fine/tau: batched SplitFactors fields
            ([F, Sc, A], [F, Sc, C], [F, Sc, Q], [F, Sc, B], [F, Sc]).
        t: [S] fast-time base (``signal/synth.py:fast_time_base``) -- the
            echo gate is re-evaluated in-kernel against the same values
            the dense path compares.
        echo_upper: reference-fidelity upper echo gate
            ``t - tau <= echo_upper`` (``RadarConfig.chirp_duration``),
            None for the "tpu" fidelity (no upper gate).
    """
    F, Sc, A = ant.shape
    B = fine.shape[-1]
    Q = coarse.shape[-1]
    S = t.shape[0]
    AC = A * C

    if noise_domain == "range_freq" and not noise_taps:
        raise ValueError("noise_domain='range_freq' needs the window's "
                         "noise_taps (ops/windows.py:window_freq_taps)")
    c_ops, c_specs = _common_consts(C, S, mix, dc_removal, doppler_window,
                                    train, guard, min_range_bin,
                                    max_range_bin)
    ant_t = jnp.swapaxes(ant, -1, -2)                       # [F, A, Sc]
    dopp_t = jnp.swapaxes(dopp, -1, -2)                     # [F, C, Sc]

    fr = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda f: (f,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda f: (0,) * len(shape), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [seed_spec, fr((A, Sc)), fr((A, Sc)), fr((C, Sc)),
                fr((C, Sc)), fr((Sc, Q)), fr((Sc, Q)), fr((Sc, B)),
                fr((Sc, B)), fr((Sc, 1)), const((1, S))] + c_specs
    operands = [seeds.astype(jnp.int32),
                jnp.real(ant_t), jnp.imag(ant_t),
                jnp.real(dopp_t), jnp.imag(dopp_t),
                jnp.real(coarse), jnp.imag(coarse),
                jnp.real(fine), jnp.imag(fine),
                tau.astype(jnp.float32)[:, :, None],
                t.astype(jnp.float32)[None, :]] + c_ops
    has_clutter = clutter is not None
    if has_clutter:
        in_specs.append(fr((C, S)))
        operands.append(jnp.swapaxes(clutter, -1, -2)
                        .astype(jnp.float32))               # [F, D, R]

    kc = lambda shape, dt: jax.ShapeDtypeStruct((F,) + shape, dt)
    zr, zi, p_ds, score_ds = pl.pallas_call(
        functools.partial(
            _frontend_kernel_split, echo_upper=echo_upper, S=S,
            A=A, C=C, sigma=sigma, train=train,
            guard=guard, neighborhood=neighborhood, offset_db=offset_db,
            threshold_db=threshold_db, clutter_offset_db=clutter_offset_db,
            has_clutter=has_clutter, synth_precision=synth_precision,
            z_precision=sig_precision,
            doppler_precision=doppler_precision,
            doppler_layout=doppler_layout, noise_impl=noise_impl,
            noise_domain=noise_domain, noise_taps=noise_taps,
            dc_removal=dc_removal, cfar_impl=cfar_impl),
        grid=(F,),
        in_specs=in_specs,
        out_specs=(fr((S, AC)), fr((S, AC)), fr((C, S)), fr((C, S))),
        out_shape=(kc((S, AC), jnp.float32), kc((S, AC), jnp.float32),
                   kc((C, S), jnp.float32), kc((C, S), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=F * ((18 * Sc * S * S + 18 * AC * Sc * S
                        if noise_domain == "range_freq"
                        else 18 * AC * Sc * S + 18 * AC * S * S)
                       + 8 * Sc * S + 6 * AC * Sc  # factor composition
                       + 6 * AC * S * C
                       + 4 * AC * S
                       + 4 * C * S * (S + C)),
            bytes_accessed=F * (2 * Sc * (A + C + Q + B) * 4
                                + 2 * AC * S * 4 + 2 * C * S * 4),
            transcendentals=F * (4 * AC * S + 2 * C * S)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)

    return _finalize(zr, zi, p_ds, score_ds, K, A, C, doppler_window,
                     topk_mode)
