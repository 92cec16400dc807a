"""LiDAR-Iris descriptor — TPU-native, full reference fidelity.

Parity with the reference's ``lidar_iris_descriptor``
(``include/descriptor.h:462-1302``), round-2 completion (VERDICT r1 §3):

- ``getIris`` (``descriptor.h:515-575``), BOTH beam variants: row = floor(xy
  distance) in 1 m bins (rows scale to ``max_radius``), azimuth ~1 deg
  columns, 8 elevation-arc occupancy bits per cell (64-beam: 4 deg arcs
  from -24.9 deg; 16-beam: from -15 deg); row key = row-wise mean of the
  per-cell MAX-Z matrix (not of the byte code).
- wire format = [image (rows*cols), row key (rows)] — the reference
  broadcasts both (``makeAndSaveDescriptorAndKey`` ``:1065-1085``).
- binary features via a ONE-SIDED 1-D log-Gabor bank (``logGaborFilter``
  ``:610-661``): only non-negative frequencies pass, so the response is the
  complex analytic signal and T carries independent (real>0, imag>0)
  quadrature bits. (A symmetric |f| filter — round 1's bug — yields a real
  response whose imaginary bits are sign noise.) M masks low-magnitude
  bins at the reference's 1e-4 threshold (rescaled for normalized ifft).
- matching = the full 2-D **log-polar FFT template match**
  (``forwardFFT``/``highpass``/``logpolar``/``logPolarFFTTemplateMatch``
  ``:715-931``): fftshifted spectrum magnitudes, cosine high-pass,
  log-polar resampling, phase correlation for rotation/scale, rotate-scale
  correction, second phase correlation for the column shift; then masked
  Hamming over shift±2 (``getHammingDistance`` ``:933-962``) under match
  modes 0/1/2 (``compare`` ``:964-1023``: forward / 180-flipped / both).

All of it is jnp.fft + gather-based bilinear resampling — batchable,
jittable, vmapped over retrieval candidates.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pointcloud import Cloud
from . import base


@dataclass(frozen=True)
class LidarIrisConfig:
    """Defaults mirror reference ``include/descriptor.h:472-509``."""

    rows: int = 80           # distance bins
    cols: int = 360          # azimuth bins
    n_scan: int = 64         # beam count (16 or 64 variants in reference)
    max_radius: float = 80.0
    num_candidates: int = 10
    exclude_recent: int = 30
    distance_threshold: float = 0.32
    nscale: int = 4
    min_wave_length: float = 18.0
    mult: float = 1.6
    sigma_on_f: float = 0.75
    match_mode: int = 2      # 0: forward, 1: 180-flipped, 2: both (min)


class Iris(NamedTuple):
    image: jax.Array     # [rows, cols] float (0..255 occupancy codes)
    row_key: jax.Array   # [rows] row means of per-cell max-z


def make(cloud: Cloud, cfg: LidarIrisConfig) -> Iris:
    """Encode one cloud -> iris image + max-z row key (reference
    ``getIris``, ``descriptor.h:515-575``)."""
    x, y, z = cloud.xyz[..., 0], cloud.xyz[..., 1], cloud.xyz[..., 2]
    r = jnp.sqrt(x * x + y * y)
    # row: 1 m distance bins at the reference geometry (rows == max_radius);
    # scaled bins otherwise
    row = jnp.clip(
        jnp.floor(r * (cfg.rows / cfg.max_radius)).astype(jnp.int32),
        0, cfg.rows - 1,
    )
    # column: floor(yaw_deg + 0.5), yaw in [0, 360)
    yaw_deg = jnp.degrees(jnp.arctan2(y, x)) + 180.0
    col = jnp.clip(
        jnp.floor(yaw_deg * (cfg.cols / 360.0) + 0.5).astype(jnp.int32),
        0, cfg.cols - 1,
    )
    # elevation arc -> 3-bit code: 4-degree arcs, origin per beam variant
    pitch_deg = jnp.degrees(jnp.arctan2(z, jnp.maximum(r, 1e-6)))
    arc_origin = 15.0 if cfg.n_scan == 16 else 24.9
    arc = jnp.clip(
        jnp.floor((pitch_deg + arc_origin) / 4.0).astype(jnp.int32), 0, 7
    )
    valid = cloud.mask & (r < cfg.max_radius) & (r > 0.1)

    flat = jnp.where(valid, row * cfg.cols + col, cfg.rows * cfg.cols)
    nbins = cfg.rows * cfg.cols
    # 8 occupancy channels via scatter-max of ones -> byte code
    chans = []
    for b in range(8):
        hit = (arc == b) & valid
        ch = jnp.zeros((nbins + 1,), jnp.float32)
        ch = ch.at[jnp.where(hit, flat, nbins)].max(
            jnp.where(hit, 1.0, 0.0)
        )
        chans.append(ch[:-1])
    img = sum(c * float(1 << b) for b, c in enumerate(chans))
    img = img.reshape(cfg.rows, cfg.cols)

    # row key: row-wise mean of the per-cell MAX-Z (reference irisRowKeyMat:
    # zero-initialized and only updated when z exceeds the current value, so
    # cells hold max(0, max z) and empty cells contribute 0)
    zmax = jnp.zeros((nbins + 1,), jnp.float32)
    zmax = zmax.at[flat].max(jnp.where(valid, z, 0.0))
    zm = zmax[:-1].reshape(cfg.rows, cfg.cols)
    return Iris(img, jnp.mean(zm, axis=1))


# ---------------------------------------------------------------------------
# DFT backend: matmul-DFT on TPU, jnp.fft elsewhere
# ---------------------------------------------------------------------------
#
# The iris sizes (80 rows, 360 cols) are non-powers-of-two: XLA lowers
# their FFTs to Bluestein custom calls, and the COMPOSED batched match
# program (B queries x num_candidates x ~10 FFT stages) exceeds the
# remote compile service's envelope on this rig (two ~35-min compile
# deaths at B>=16; CLAUDE.md r5 gotcha) while the per-query program runs
# dispatch-width-starved (31.8 ms/query measured). A dense DFT is a
# [n, n] complex matmul — MXU-shaped, compiles in seconds, batches
# cleanly, and at 80x360 costs ~76 MFLOP per 2-D transform (minutes
# below MXU speed-of-light). Under the package's
# jax_default_matmul_precision=highest the numerics are f32-exact
# matmuls; tests pin equality with the jnp.fft path.
#
# MATMUL_DFT: None = auto (matmul on non-CPU backends), True/False force.
MATMUL_DFT: bool | None = None


def _matmul_dft() -> bool:
    if MATMUL_DFT is not None:
        return MATMUL_DFT
    return jax.default_backend() != "cpu"


def _dft_w(n: int, inverse: bool) -> jax.Array:
    k = jnp.arange(n, dtype=jnp.float32)
    # reduce j*k mod n BEFORE scaling: j*k < n^2 < 2^24 is exact in f32,
    # so every angle stays below 2*pi — at raw j*k (~2250 rad for n=360)
    # the f32 phase error is ~1e-4 rad, enough to flip near-zero
    # quadrature bits between this path and jnp.fft (code-review r5)
    jk = jnp.mod(jnp.outer(k, k), float(n))
    ang = (2.0 * jnp.pi / n) * jk
    w = jax.lax.complex(jnp.cos(ang), jnp.sin(ang) * (1.0 if inverse else -1.0))
    return w / n if inverse else w


def _fft1(x: jax.Array) -> jax.Array:
    """DFT along the last axis."""
    if not _matmul_dft():
        return jnp.fft.fft(x, axis=-1)
    return x.astype(jnp.complex64) @ _dft_w(x.shape[-1], False)


def _ifft1(x: jax.Array) -> jax.Array:
    if not _matmul_dft():
        return jnp.fft.ifft(x, axis=-1)
    return x.astype(jnp.complex64) @ _dft_w(x.shape[-1], True)


def _fft2(x: jax.Array) -> jax.Array:
    """2-D DFT of the trailing two axes: W_M @ x @ W_N (W symmetric)."""
    if not _matmul_dft():
        return jnp.fft.fft2(x)
    M, N = x.shape[-2], x.shape[-1]
    return _dft_w(M, False) @ x.astype(jnp.complex64) @ _dft_w(N, False)


def _ifft2(x: jax.Array) -> jax.Array:
    if not _matmul_dft():
        return jnp.fft.ifft2(x)
    M, N = x.shape[-2], x.shape[-1]
    return _dft_w(M, True) @ x.astype(jnp.complex64) @ _dft_w(N, True)


# ---------------------------------------------------------------------------
# binary feature encoding (one-sided log-Gabor bank)
# ---------------------------------------------------------------------------


def log_gabor_bank(cfg: LidarIrisConfig) -> jax.Array:
    """ONE-SIDED frequency-domain log-Gabor transfer functions
    [nscale, cols]: nonzero only for frequency bins 1..cols/2 (reference
    ``logGaborFilter`` fills just the first ndata/2+1 bins, so the filtered
    signal is the complex analytic response whose real/imag parts are the
    quadrature pair)."""
    n = cfg.cols
    half = n // 2
    # radius[i] = i / n for i in 1..half (radius[0] participates via the
    # DC kill below, exactly like the reference's radius[0]=1, lg[0]=0)
    idx = jnp.arange(n)
    radius = jnp.where(idx == 0, 1.0, idx / float(n))
    filters = []
    wavelength = cfg.min_wave_length
    for _ in range(cfg.nscale):
        f0 = 1.0 / wavelength
        lg = jnp.exp(
            -(jnp.log(radius / f0) ** 2) / (2 * jnp.log(cfg.sigma_on_f) ** 2)
        )
        lg = jnp.where((idx == 0) | (idx > half), 0.0, lg)  # one-sided
        filters.append(lg)
        wavelength *= cfg.mult
    return jnp.stack(filters)  # [nscale, cols]


# reference noise-mask threshold 1e-4 (descriptor.h:679) with cv's
# UNNORMALIZED idft; jnp.fft.ifft divides by n, so rescale
_M_THRESH_REF = 1e-4


def encode_features(image: jax.Array, cfg: LidarIrisConfig):
    """Binary template T and noise mask M (reference ``logFeatureEncode``,
    ``descriptor.h:663-683``). T: [nscale, rows, cols, 2] quadrature bits;
    M: [nscale, rows, cols] low-energy mask (True = unreliable)."""
    bank = log_gabor_bank(cfg)                      # [S, C]
    spec = _fft1(image)                             # [R, C]
    resp = _ifft1(spec[None, :, :] * bank[:, None, :])
    T = jnp.stack([resp.real > 0, resp.imag > 0], axis=-1)
    M = jnp.abs(resp) < (_M_THRESH_REF / cfg.cols)
    return T, M


# ---------------------------------------------------------------------------
# 2-D log-polar FFT template match (descriptor.h:715-931)
# ---------------------------------------------------------------------------


def _bilinear(img: jax.Array, xq: jax.Array, yq: jax.Array) -> jax.Array:
    """Bilinear sample img[y, x] at float coords, zero outside (cv::remap
    BORDER_CONSTANT semantics)."""
    H, W = img.shape
    x0 = jnp.floor(xq)
    y0 = jnp.floor(yq)
    fx = xq - x0
    fy = yq - y0

    def at(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = img[
            jnp.clip(yi, 0, H - 1).astype(jnp.int32),
            jnp.clip(xi, 0, W - 1).astype(jnp.int32),
        ]
        return jnp.where(inside, v, 0.0)

    return (
        at(y0, x0) * (1 - fx) * (1 - fy)
        + at(y0, x0 + 1) * fx * (1 - fy)
        + at(y0 + 1, x0) * (1 - fx) * fy
        + at(y0 + 1, x0 + 1) * fx * fy
    )


def _spectrum_magnitude(im: jax.Array) -> jax.Array:
    """|fftshifted 2-D DFT| / (M*N) (reference ``forwardFFT`` + magnitude)."""
    M, N = im.shape
    F = jnp.fft.fftshift(_fft2(im))
    return jnp.abs(F) / (M * N)


def _highpass(rows: int, cols: int) -> jax.Array:
    """(1 - cos_y cos_x)(2 - cos_y cos_x) (reference ``highpass``)."""
    ay = jnp.cos(-jnp.pi / 2 + jnp.arange(rows) * (jnp.pi / rows))
    bx = jnp.cos(-jnp.pi / 2 + jnp.arange(cols) * (jnp.pi / cols))
    t = ay[:, None] * bx[None, :]
    return (1.0 - t) * (2.0 - t)


def _logpolar(src: jax.Array):
    """Log-polar resample of the spectrum magnitude (reference
    ``logpolar``): radii along columns, 180 deg of angles along rows.
    Returns (dst [rows, cols], log_base)."""
    rows, cols = src.shape
    radii = float(cols)
    angles = float(rows)
    cx, cy = cols // 2, rows // 2
    d = jnp.sqrt(float((cols - cx) ** 2 + (rows - cy) ** 2))
    log_base = jnp.power(10.0, jnp.log10(d) / radii)
    theta = jnp.pi / 2.0 + jnp.arange(rows) * (jnp.pi / angles)   # [rows]
    radius = jnp.power(log_base, jnp.arange(cols).astype(jnp.float32))
    xq = radius[None, :] * jnp.sin(theta)[:, None] + cx
    yq = radius[None, :] * jnp.cos(theta)[:, None] + cy
    return _bilinear(src, xq, yq), log_base


def _phase_correlate(a: jax.Array, b: jax.Array):
    """cv::phaseCorrelate(a, b): sub-pixel peak of the inverse cross-power
    spectrum, 5x5 weighted-centroid refinement, signed shifts in
    (-dim/2, dim/2]. Returns (dx, dy, response)."""
    H, W = a.shape
    Fa = _fft2(a)
    Fb = _fft2(b)
    cross = Fa * jnp.conj(Fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    corr = _ifft2(cross).real                        # [H, W]
    flat = jnp.argmax(corr)
    py, px = flat // W, flat % W
    # 5x5 weighted centroid around the (circular) peak
    oy = jnp.arange(-2, 3)
    ox = jnp.arange(-2, 3)
    yy = (py + oy[:, None]) % H
    xx = (px + ox[None, :]) % W
    w = jnp.maximum(corr[yy, xx], 0.0)
    tot = jnp.maximum(jnp.sum(w), 1e-12)
    cy = py + jnp.sum(w * oy[:, None]) / tot
    cx = px + jnp.sum(w * ox[None, :]) / tot
    dx = jnp.where(cx > W / 2, cx - W, cx)
    dy = jnp.where(cy > H / 2, cy - H, cy)
    return dx, dy, corr[py, px]


def _warp_rot_scale(im: jax.Array, angle_deg: jax.Array, scale: jax.Array):
    """cv::warpAffine with getRotationMatrix2D(center, angle, 1/scale)."""
    H, W = im.shape
    cx, cy = W // 2, H // 2
    a = jnp.deg2rad(angle_deg)
    s = 1.0 / scale
    ca, sa = s * jnp.cos(a), s * jnp.sin(a)
    # dst(x, y) = src(M^-1 [x, y, 1]); cv builds M = [ca, sa, ...; -sa, ca..]
    # for forward mapping, and warpAffine inverts it internally. Build the
    # inverse map directly: src = Rinv (dst - c) + c with Rinv = rot(-a)/s
    inv_s = 1.0 / jnp.maximum(s, 1e-12)
    ica, isa = inv_s * jnp.cos(-a), inv_s * jnp.sin(-a)
    xs = jnp.arange(W) - cx
    ys = jnp.arange(H) - cy
    Xq = ica * xs[None, :] - isa * ys[:, None] + cx
    Yq = isa * xs[None, :] + ica * ys[:, None] + cy
    return _bilinear(im, Xq, Yq)


def fft_match(im0: jax.Array, im1: jax.Array) -> jax.Array:
    """Reference ``logPolarFFTTemplateMatch`` (``descriptor.h:793-924``):
    estimate how im1 maps onto im0. Returns the sub-pixel COLUMN shift
    (``rr.center.x - cols/2`` — the piece ``compare`` consumes)."""
    im0 = im0 / 255.0
    im1 = im1 / 255.0
    f0 = _spectrum_magnitude(im0)
    f1 = _spectrum_magnitude(im1)
    h = _highpass(*f0.shape)
    f0lp, log_base = _logpolar(f0 * h)
    f1lp, _ = _logpolar(f1 * h)
    dx, dy, _ = _phase_correlate(f1lp, f0lp)
    rows_lp = f0lp.shape[0]
    angle = 180.0 * dy / rows_lp
    scale = jnp.power(log_base, dx)
    # reference quirk: scale > 1.8 retries with inverted sign; the retry
    # recomputes the SAME correlation, so only the sign flip matters
    bad = scale > 1.8
    angle = jnp.where(bad, -angle, angle)
    scale = jnp.where(bad, 1.0 / scale, scale)
    angle = jnp.where(angle < -90.0, angle + 180.0, angle)
    angle = jnp.where(angle > 90.0, angle - 180.0, angle)
    im1_rs = _warp_rot_scale(im1, angle, scale)
    tx, _ty, _ = _phase_correlate(im1_rs, im0)
    return tx


# ---------------------------------------------------------------------------
# Hamming matching (descriptor.h:933-1023)
# ---------------------------------------------------------------------------


def hamming_distance(Ta, Ma, Tb, Mb, shifts: jax.Array) -> jax.Array:
    """Masked Hamming distance with the QUERY (a) circularly shifted by
    each candidate shift (reference shifts T1, ``descriptor.h:933-962``).
    Shapes: T [S, R, C, 2], M [S, R, C]; ``shifts`` [K]. Returns [K]."""

    def at_shift(s):
        Ta_s = jnp.roll(Ta, s, axis=2)
        Ma_s = jnp.roll(Ma, s, axis=2)
        valid = ~(Ma_s | Mb)
        diff = (Ta_s ^ Tb) & valid[..., None]
        total = 2 * jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(diff) / total

    return jax.vmap(at_shift)(shifts)


def _match_one_orientation(Ta, Ma, img_a, Tb, Mb, img_b, cfg):
    """fftMatch shift estimate + Hamming over shift±2 (one ``compare``
    branch). Returns (best distance, best shift of a onto b).

    Convention: ``fft_match(x, y)`` returns tx with y = roll(x, tx), so the
    roll of the QUERY (a) that aligns it onto the candidate (b) is
    ``fft_match(a, b)`` (measured: a 25-bin rotated pair recovers -24.98)."""
    shift0 = jnp.round(fft_match(img_a, img_b)).astype(jnp.int32)
    cands = (shift0 + jnp.arange(-2, 3)) % cfg.cols
    d = hamming_distance(Ta, Ma, Tb, Mb, cands)
    best = jnp.argmin(d)
    return d[best], cands[best]


def match_pair(
    img_a: jax.Array, img_b: jax.Array, cfg: LidarIrisConfig
) -> tuple[jax.Array, jax.Array]:
    """Full Iris comparison (reference ``compare``, ``descriptor.h:964-1023``)
    under the configured match mode. a = query, b = candidate.
    Returns (distance, yaw in radians)."""
    Ta, Ma = encode_features(img_a, cfg)
    Tb, Mb = encode_features(img_b, cfg)
    half = cfg.cols // 2

    if cfg.match_mode in (0, 2):
        d0, s0 = _match_one_orientation(Ta, Ma, img_a, Tb, Mb, img_b, cfg)
    if cfg.match_mode in (1, 2):
        Tb2 = jnp.roll(Tb, half, axis=2)
        Mb2 = jnp.roll(Mb, half, axis=2)
        img_b2 = jnp.roll(img_b, half, axis=-1)
        d1, s1 = _match_one_orientation(Ta, Ma, img_a, Tb2, Mb2, img_b2, cfg)
        s1 = (s1 + half) % cfg.cols

    if cfg.match_mode == 0:
        dist, shift = d0, s0
    elif cfg.match_mode == 1:
        dist, shift = d1, s1
    else:
        use1 = d1 < d0
        dist = jnp.where(use1, d1, d0)
        shift = jnp.where(use1, s1, s0)

    signed = jnp.where(shift > half, shift - cfg.cols, shift)
    yaw = signed.astype(jnp.float32) * (2 * jnp.pi / cfg.cols)
    return dist, yaw


# ---------------------------------------------------------------------------
# DB + wire plumbing
# ---------------------------------------------------------------------------


def make_db(capacity: int, cfg: LidarIrisConfig) -> base.DescriptorDB:
    return base.make_db(capacity, (cfg.rows, cfg.cols), cfg.rows)


def insert(db: base.DescriptorDB, iris: Iris, robot, index, pos=None) -> base.DescriptorDB:
    return base.db_insert(db, iris.image, iris.row_key, robot, index, pos)


def to_wire(iris: Iris) -> jax.Array:
    """[rows*cols image, rows row-key] — the reference broadcasts both
    (``makeAndSaveDescriptorAndKey``, ``descriptor.h:1065-1085``; the
    max-z row key is NOT reconstructible from the byte image)."""
    return jnp.concatenate([iris.image.reshape(-1), iris.row_key])


def from_wire(values: jax.Array, cfg: LidarIrisConfig) -> Iris:
    n = cfg.rows * cfg.cols
    return Iris(values[:n].reshape(cfg.rows, cfg.cols), values[n:])


def _query_impl(
    db: base.DescriptorDB,
    iris: Iris,
    query_robot: jax.Array,
    query_index: jax.Array,
    cfg: LidarIrisConfig,
    mode: str,
) -> base.Match:
    """Two-stage detection body (reference ``descriptor.h:1087-1250``):
    top-k by row key, then the full FFT+Hamming comparison on candidates
    (vmapped). Shared by :func:`query` and :func:`query_batch`."""
    mask = base.candidate_mask(db, query_robot, query_index, mode, cfg.exclude_recent)
    _, pos = base.topk_by_key(db.keys, iris.row_key, mask, cfg.num_candidates)
    cand_imgs = db.descriptors[pos]

    dist, yaw = jax.vmap(lambda b: match_pair(iris.image, b, cfg))(cand_imgs)
    cand_ok = mask[pos]
    dist = jnp.where(cand_ok, dist, jnp.inf)
    best = jnp.argmin(dist)
    best_pos = pos[best]
    found = dist[best] < cfg.distance_threshold
    return base.Match(
        found=found,
        db_pos=jnp.where(found, best_pos, -1),
        robot=jnp.where(found, db.robot[best_pos], -1),
        index=jnp.where(found, db.index[best_pos], -1),
        distance=dist[best],
        yaw=yaw[best],
    )


@partial(jax.jit, static_argnames=("cfg", "mode"))
def query(
    db: base.DescriptorDB,
    iris: Iris,
    query_robot: jax.Array,
    query_index: jax.Array,
    cfg: LidarIrisConfig,
    mode: str = "intra",
) -> base.Match:
    return _query_impl(db, iris, query_robot, query_index, cfg, mode)


@partial(jax.jit, static_argnames=("cfg", "mode"))
def query_batch(
    db: base.DescriptorDB,
    images: jax.Array,       # [B, rows, cols]
    row_keys: jax.Array,     # [B, rows]
    query_robots: jax.Array,  # [B]
    query_indices: jax.Array,  # [B]
    cfg: LidarIrisConfig,
    mode: str = "intra",
) -> base.Match:
    """Vmapped multi-query retrieval — the serving-throughput path, same
    contract as ``scan_context.query_batch`` (first-class families get
    first-class batch serving; reference matching cost center is the
    per-query ``descriptor.h:933-1023`` Hamming loop). The row-key top-k
    over all queries is one [B, N] distance matrix; the FFT template
    match + Hamming stage batches over B x num_candidates pairs."""

    def one(img, key, robot, index):
        return _query_impl(db, Iris(img, key), robot, index, cfg, mode)

    return jax.vmap(one)(images, row_keys, query_robots, query_indices)
