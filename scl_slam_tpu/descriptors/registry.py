"""Uniform descriptor-family interface — the ``scan_descriptor`` dispatch.

The reference selects one of its descriptor implementations at construction
from the ``descriptor_type`` parameter (reference
``include/distributedMapping.h:156-182``) behind the abstract
``scan_descriptor`` interface (``include/descriptor.h:21-36``). Here each
family is adapted to one protocol:

    make(cloud)            -> opaque descriptor pytree
    key_of(desc)           -> retrieval key vector
    full_of(desc)          -> full descriptor array stored in the DB
    to_wire(desc)          -> flat float vector for broadcast
    from_wire(values)      -> descriptor
    make_db(capacity)      -> DescriptorDB
    insert(db, desc, r, i) -> db
    query(db, desc, robot, index, mode) -> Match

All functions are pure/jittable; ``Family`` instances are hashable statics
(safe as jit static args).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp

from ..config import SlamConfig, DescriptorType
from . import base, geometric, lidar_iris, m2dp, scan_context, shot


@dataclass(frozen=True)
class Family:
    name: str
    make: Callable
    make_db: Callable
    from_db: Callable
    insert: Callable
    query: Callable
    to_wire: Callable
    from_wire: Callable
    wire_dim: int
    # descriptor pytree -> (full DB array, retrieval key): the two tensors
    # ``insert`` hands to base.db_insert. Lets the macro-batch path collapse
    # B inserts into one base.db_insert_block without per-family knowledge.
    parts: Callable = None

    def __hash__(self):
        return hash((self.name, self.wire_dim))

    def __eq__(self, other):
        return isinstance(other, Family) and (self.name, self.wire_dim) == (
            other.name, other.wire_dim
        )


def _vector_family(name, make_fn, dim, params) -> Family:
    """GRSD / FPFH / SHOT / M2DP share the plain-vector DB protocol."""

    def query(db, desc, robot, index, mode):
        return geometric.vector_query(
            db, desc, robot, index,
            num_candidates=params.num_candidates,
            exclude_recent=params.exclude_recent,
            threshold=params.distance_threshold,
            mode=mode,
        )

    return Family(
        name=name,
        make=make_fn,
        make_db=lambda capacity: geometric.make_db(capacity, dim),
        from_db=lambda db, slot: db.descriptors[slot],
        insert=lambda db, d, r, i, pos=None: geometric.insert(db, d, r, i, pos),
        query=query,
        to_wire=lambda d: d,
        from_wire=lambda v: v,
        wire_dim=dim,
        parts=lambda d: (d, d),
    )


def exclude_recent(cfg: SlamConfig) -> int:
    """The active family's recent-exclusion window (host-side gating must
    match what the family's query masks on device)."""
    kind = cfg.descriptor_type
    if kind == DescriptorType.SCAN_CONTEXT:
        return cfg.scan_context.exclude_recent
    if kind == DescriptorType.LIDAR_IRIS:
        return cfg.lidar_iris.exclude_recent
    if kind == DescriptorType.M2DP:
        return cfg.m2dp.exclude_recent
    if kind == DescriptorType.GRSD:
        return cfg.grsd.exclude_recent
    if kind == DescriptorType.FPFH:
        return cfg.fpfh.exclude_recent
    if kind == DescriptorType.SHOT:
        return cfg.shot.exclude_recent
    raise ValueError(f"unknown descriptor type {kind}")


def get_family(cfg: SlamConfig) -> Family:
    kind = cfg.descriptor_type
    if kind == DescriptorType.SCAN_CONTEXT:
        from ..runtime.state import scan_context_config

        sc_cfg = scan_context_config(cfg)
        return Family(
            name="scan_context",
            make=lambda cloud: scan_context.make(cloud, sc_cfg),
            make_db=lambda capacity: scan_context.make_db(capacity, sc_cfg),
            from_db=lambda db, slot: scan_context.ScanContext(
                db.descriptors[slot], db.keys[slot],
                jnp.mean(db.descriptors[slot], axis=0),
            ),
            insert=scan_context.insert,
            query=lambda db, d, r, i, mode: scan_context.query(
                db, d, r, i, sc_cfg, mode=mode
            ),
            to_wire=scan_context.to_wire,
            from_wire=lambda v: scan_context.from_wire(v, sc_cfg),
            wire_dim=sc_cfg.num_rings * sc_cfg.num_sectors,
            parts=lambda d: (d.image, d.ring_key),
        )
    if kind == DescriptorType.LIDAR_IRIS:
        p = cfg.lidar_iris
        li_cfg = lidar_iris.LidarIrisConfig(
            rows=p.rows, cols=p.cols, n_scan=p.n_scan,
            distance_threshold=p.distance_threshold,
            exclude_recent=p.exclude_recent, num_candidates=p.num_candidates,
            nscale=p.nscale, min_wave_length=p.min_wave_length,
            mult=p.mult, sigma_on_f=p.sigma_on_f,
            match_mode=p.match_mode,
        )
        return Family(
            name="lidar_iris",
            make=lambda cloud: lidar_iris.make(cloud, li_cfg),
            make_db=lambda capacity: lidar_iris.make_db(capacity, li_cfg),
            from_db=lambda db, slot: lidar_iris.Iris(
                db.descriptors[slot], db.keys[slot]
            ),
            insert=lidar_iris.insert,
            query=lambda db, d, r, i, mode: lidar_iris.query(
                db, d, r, i, li_cfg, mode=mode
            ),
            to_wire=lidar_iris.to_wire,
            from_wire=lambda v: lidar_iris.from_wire(v, li_cfg),
            # image + row key: the max-z row key is not reconstructible
            # from the byte image, so the reference wires both
            # (descriptor.h:1065-1085)
            wire_dim=p.rows * p.cols + p.rows,
            parts=lambda d: (d.image, d.row_key),
        )
    if kind == DescriptorType.M2DP:
        p = cfg.m2dp
        m_cfg = m2dp.M2DPConfig(
            num_t=p.num_t, num_r=p.num_r, num_p=p.num_p, num_q=p.num_q,
            max_rho=p.max_rho, num_candidates=p.num_candidates,
            exclude_recent=p.exclude_recent,
            distance_threshold=p.distance_threshold,
        )
        return Family(
            name="m2dp",
            make=lambda cloud: m2dp.make(cloud, m_cfg),
            make_db=lambda capacity: m2dp.make_db(capacity, m_cfg),
            from_db=lambda db, slot: m2dp.M2DP(db.descriptors[slot]),
            insert=lambda db, d, r, i, pos=None: m2dp.insert(db, d, r, i, pos),
            query=lambda db, d, r, i, mode: m2dp.query(db, d, r, i, m_cfg, mode=mode),
            to_wire=m2dp.to_wire,
            from_wire=lambda v: m2dp.from_wire(v, m_cfg),
            wire_dim=m_cfg.num_p * m_cfg.num_q + m_cfg.num_t * m_cfg.num_r,
            parts=lambda d: (d.descriptor, d.descriptor),
        )
    if kind == DescriptorType.GRSD:
        p = cfg.grsd
        g_cfg = geometric.GRSDConfig(
            num_bins=p.num_bins, knn=p.knn, num_candidates=p.num_candidates,
            exclude_recent=p.exclude_recent,
            distance_threshold=p.distance_threshold,
            voxel_width=p.voxel_width, extent_xy=p.extent_xy,
            extent_z=p.extent_z,
        )
        return _vector_family(
            "grsd",
            lambda cloud: geometric.grsd_make(cloud, g_cfg).descriptor,
            g_cfg.num_bins,
            g_cfg,
        )
    if kind == DescriptorType.FPFH:
        p = cfg.fpfh
        f_cfg = geometric.FPFHConfig(
            num_bins=p.num_bins, knn=p.knn, num_candidates=p.num_candidates,
            exclude_recent=p.exclude_recent,
            distance_threshold=p.distance_threshold,
        )
        return _vector_family(
            "fpfh",
            lambda cloud: geometric.fpfh_make(cloud, f_cfg).descriptor,
            3 * f_cfg.num_bins,
            f_cfg,
        )
    if kind == DescriptorType.SHOT:
        p = cfg.shot
        s_cfg = shot.SHOTConfig(
            azimuth_bins=p.azimuth_bins, elevation_bins=p.elevation_bins,
            radial_bins=p.radial_bins, cos_bins=p.cos_bins,
            max_radius=p.max_radius, knn=p.knn,
            num_candidates=p.num_candidates, exclude_recent=p.exclude_recent,
            distance_threshold=p.distance_threshold,
        )
        return _vector_family(
            "shot",
            lambda cloud: shot.shot_make(cloud, s_cfg).descriptor,
            s_cfg.dim,
            s_cfg,
        )
    raise ValueError(f"unknown descriptor type {kind}")
