"""LiDAR-Iris descriptor — TPU-native.

Capability parity with the reference's ``lidar_iris_descriptor``
(``include/descriptor.h:462-1302``):

- 80x360 "iris" image: per-(ring, azimuth) 8-bit occupancy code over
  elevation arcs (``getIris``, ``descriptor.h:515-575``; 16- and 64-beam
  variants), row key = row means
- binary features via a 1-D log-Gabor filter bank (4 scales) applied per row
  in the frequency domain (``logGaborFilter`` ``descriptor.h:610-661``,
  ``logFeatureEncode`` ``:663-683``): T = phase-quadrant bits, M = low-energy
  noise mask
- matching: rotation estimated by FFT phase correlation over the azimuth
  axis (the reference's log-polar FFT template match, ``descriptor.h:793-931``,
  collapses to a circular column shift for yaw-only motion), then masked
  Hamming distance over shift±2 with an optional 180°-flip retry
  (``getHammingDistance`` ``:933-962``, ``compare`` ``:964-1023``)

TPU-first: images live in the shared DescriptorDB; the log-Gabor encoding and
Hamming search run only on the top-k candidates, fully batched (vmapped
FFTs — XLA lowers them onto the chip; candidates x shifts Hamming is one
XOR-mean reduction).
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
    match_flipped: bool = True  # reference matchMode 2 retries 180°


class Iris(NamedTuple):
    image: jax.Array     # [rows, cols] float (0..255 occupancy codes)
    row_key: jax.Array   # [rows]


def make(cloud: Cloud, cfg: LidarIrisConfig) -> Iris:
    """Encode one cloud -> iris image (reference ``getIris``,

    ``descriptor.h:515-575``): each point ORs a bit, selected by its
    elevation arc, into its (distance-ring, azimuth) cell."""
    x, y, z = cloud.xyz[..., 0], cloud.xyz[..., 1], cloud.xyz[..., 2]
    r = jnp.sqrt(x * x + y * y)
    az = jnp.arctan2(y, x)
    col = jnp.clip(
        ((az + jnp.pi) / (2 * jnp.pi) * cfg.cols).astype(jnp.int32), 0, cfg.cols - 1
    )
    row = jnp.clip(
        (r / cfg.max_radius * cfg.rows).astype(jnp.int32), 0, cfg.rows - 1
    )
    # elevation arc -> 3-bit code (8 arcs). The 64-beam reference maps pitch
    # in [-24°, +2°]; use the same span.
    pitch = jnp.arctan2(z, jnp.maximum(r, 1e-6))
    lo, hi = -24.8 * jnp.pi / 180, 2.0 * jnp.pi / 180
    arc = jnp.clip(((pitch - lo) / (hi - lo) * 8).astype(jnp.int32), 0, 7)
    valid = cloud.mask & (r < cfg.max_radius) & (r > 0.1)

    # 8 occupancy channels via scatter-max of ones, then pack to a byte code
    flat = jnp.where(valid, row * cfg.cols + col, cfg.rows * cfg.cols)
    chans = []
    for b in range(8):
        hit = (arc == b) & valid
        ch = jnp.zeros((cfg.rows * cfg.cols + 1,), jnp.float32)
        ch = ch.at[jnp.where(hit, flat, cfg.rows * cfg.cols)].max(
            jnp.where(hit, 1.0, 0.0)
        )
        chans.append(ch[:-1])
    img = sum(c * float(1 << b) for b, c in enumerate(chans))
    img = img.reshape(cfg.rows, cfg.cols)
    return Iris(img, jnp.mean(img, axis=1))


def log_gabor_bank(cfg: LidarIrisConfig) -> jax.Array:
    """Frequency-domain 1-D log-Gabor transfer functions [nscale, cols].

    Reference ``logGaborFilter`` (``descriptor.h:610-661``): radial component
    exp(-(log(f/f0))^2 / (2 log(sigmaOnf)^2)), wavelength scaled by ``mult``
    per scale, DC term zeroed.
    """
    n = cfg.cols
    # frequency axis for rfft-like layout over full fft: [0, 1/n, ..., 0.5, ...]
    freq = jnp.fft.fftfreq(n)  # [-0.5, 0.5)
    absf = jnp.abs(freq)
    filters = []
    wavelength = cfg.min_wave_length
    for _ in range(cfg.nscale):
        f0 = 1.0 / wavelength
        lg = jnp.exp(
            -(jnp.log(jnp.maximum(absf, 1e-12) / f0) ** 2)
            / (2 * jnp.log(cfg.sigma_on_f) ** 2)
        )
        lg = lg.at[0].set(0.0)  # kill DC
        filters.append(lg)
        wavelength *= cfg.mult
    return jnp.stack(filters)  # [nscale, cols]


def encode_features(image: jax.Array, cfg: LidarIrisConfig):
    """Binary template T and noise mask M (reference ``logFeatureEncode``,

    ``descriptor.h:663-683``). T: [nscale, rows, cols, 2] phase-quadrant
    bits; M: [nscale, rows, cols] low-energy mask (True = unreliable)."""
    bank = log_gabor_bank(cfg)                      # [S, C]
    spec = jnp.fft.fft(image, axis=-1)              # [R, C]
    resp = jnp.fft.ifft(spec[None, :, :] * bank[:, None, :], axis=-1)  # [S, R, C]
    T = jnp.stack([resp.real > 0, resp.imag > 0], axis=-1)
    M = jnp.abs(resp) < 1e-3
    return T, M


def phase_correlation_shift(a: jax.Array, b: jax.Array) -> jax.Array:
    """Column shift that best aligns image b to image a.

    Cross-power spectrum along the azimuth axis, summed over rows
    (the yaw-only specialization of the reference's FFT template match,
    ``descriptor.h:793-931``). Returns integer shift in [0, cols).
    """
    Fa = jnp.fft.fft(a, axis=-1)
    Fb = jnp.fft.fft(b, axis=-1)
    cross = Fa * jnp.conj(Fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-9)
    corr = jnp.fft.ifft(cross, axis=-1).real.sum(axis=-2)  # [C]
    return jnp.argmax(corr)


def hamming_distance(
    Ta, Ma, Tb, Mb, shifts: jax.Array
) -> jax.Array:
    """Masked Hamming distance for each circular column shift of b.

    Reference ``getHammingDistance`` (``descriptor.h:933-962``): fraction of
    differing bits over jointly-valid positions. Shapes: T [S, R, C, 2],
    M [S, R, C]; ``shifts`` [K]. Returns [K].
    """
    def at_shift(s):
        Tb_s = jnp.roll(Tb, s, axis=2)
        Mb_s = jnp.roll(Mb, s, axis=2)
        valid = ~(Ma | Mb_s)
        diff = (Ta ^ Tb_s) & valid[..., None]
        total = 2 * jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(diff) / total

    return jax.vmap(at_shift)(shifts)


def match_pair(
    img_a: jax.Array, img_b: jax.Array, cfg: LidarIrisConfig
) -> tuple[jax.Array, jax.Array]:
    """Full Iris comparison of two images (reference ``compare``,

    ``descriptor.h:964-1023``): phase-correlate for a shift estimate, masked
    Hamming over shift±2, optional 180°-flip retry. Returns (distance, yaw)."""
    Ta, Ma = encode_features(img_a, cfg)
    shift0 = phase_correlation_shift(img_a, img_b)
    cands = (shift0 + jnp.arange(-2, 3)) % cfg.cols

    Tb, Mb = encode_features(img_b, cfg)
    d = hamming_distance(Ta, Ma, Tb, Mb, cands)
    best = jnp.argmin(d)
    dist, shift = d[best], cands[best]

    if cfg.match_flipped:
        img_b2 = jnp.roll(img_b, cfg.cols // 2, axis=-1)
        shift1 = phase_correlation_shift(img_a, img_b2)
        cands2 = (shift1 + jnp.arange(-2, 3)) % cfg.cols
        Tb2 = jnp.roll(Tb, cfg.cols // 2, axis=2)
        Mb2 = jnp.roll(Mb, cfg.cols // 2, axis=2)
        d2 = hamming_distance(Ta, Ma, Tb2, Mb2, cands2)
        best2 = jnp.argmin(d2)
        use2 = d2[best2] < dist
        dist = jnp.where(use2, d2[best2], dist)
        shift = jnp.where(use2, (cands2[best2] + cfg.cols // 2) % cfg.cols, shift)

    half = cfg.cols // 2
    signed = jnp.where(shift > half, shift - cfg.cols, shift)
    yaw = signed.astype(jnp.float32) * (2 * jnp.pi / cfg.cols)
    return dist, yaw


def make_db(capacity: int, cfg: LidarIrisConfig) -> base.DescriptorDB:
    return base.make_db(capacity, (cfg.rows, cfg.cols), cfg.rows)


def insert(db: base.DescriptorDB, iris: Iris, robot, index, pos=None) -> base.DescriptorDB:
    return base.db_insert(db, iris.image, iris.row_key, robot, index, pos)


def to_wire(iris: Iris) -> jax.Array:
    return iris.image.reshape(-1)


def from_wire(values: jax.Array, cfg: LidarIrisConfig) -> Iris:
    img = values.reshape(cfg.rows, cfg.cols)
    return Iris(img, jnp.mean(img, axis=1))


@partial(jax.jit, static_argnames=("cfg", "mode"))
def query(
    db: base.DescriptorDB,
    iris: Iris,
    query_robot: jax.Array,
    query_index: jax.Array,
    cfg: LidarIrisConfig,
    mode: str = "intra",
) -> base.Match:
    """Two-stage detection (reference ``descriptor.h:1087-1250``): top-k by

    row key, then the full FFT+Hamming comparison on candidates (vmapped)."""
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
