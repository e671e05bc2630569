"""Halo merger trees: particle-membership matching across snapshots.

The reference declares `build_merger_tree` in halo_utils and never
implements it (include/analysis/halo_finder.hpp:113-117, zero code --
SURVEY.md section 2.7). This module implements it on-device:

  * `match_halos`: shared-particle-count matrix between two catalogs
    (segment-sum over joint halo-id keys; particle IDs are implicit array
    order, which the simulation preserves),
  * `link_progenitors`: descendant/main-progenitor links a la standard
    merger-tree builders (most-bound-particle-free variant: link by
    largest shared membership),
  * `MergerForest.build`: fold a time-ordered sequence of snapshots into
    per-halo progenitor histories (mass accretion history extraction).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_halos",))
def match_halos(plabel_a, plabel_b, *, max_halos: int = 256):
    """Shared-particle counts between halos of two snapshots.

    plabel_a/b: [N] per-particle halo id (-1 = field) from
    HaloCatalog.particle_label, same particle ordering in both.
    Returns shared [max_halos, max_halos]: shared[a, b] = #particles in
    halo a (early) that end up in halo b (late).
    """
    h = max_halos
    in_both = (plabel_a >= 0) & (plabel_b >= 0)
    joint = jnp.where(in_both, plabel_a * h + plabel_b, h * h)
    counts = jax.ops.segment_sum(
        jnp.where(in_both, 1.0, 0.0), joint, num_segments=h * h + 1)
    return counts[:h * h].reshape(h, h)


@dataclasses.dataclass
class ProgenitorLinks:
    """Links between two adjacent snapshots (host-side)."""
    descendant: np.ndarray       # [Ha] halo id in B each A-halo flows into (-1)
    main_progenitor: np.ndarray  # [Hb] largest A-progenitor of each B-halo (-1)
    n_progenitors: np.ndarray    # [Hb] number of A-halos merging into b
    shared: np.ndarray           # [Ha, Hb] particle counts


def link_progenitors(plabel_a, plabel_b, *, num_a: int, num_b: int,
                     max_halos: int = 256,
                     min_shared: int = 10) -> ProgenitorLinks:
    """Descendant/progenitor links between snapshot A (earlier) and B
    (later)."""
    shared = np.asarray(match_halos(plabel_a, plabel_b,
                                    max_halos=max_halos))
    shared = shared[:num_a, :num_b] if num_a and num_b else \
        np.zeros((num_a, num_b))
    desc = np.full((num_a,), -1, np.int64)
    if num_a and num_b:
        best = shared.argmax(axis=1)
        ok = shared[np.arange(num_a), best] >= min_shared
        desc[ok] = best[ok]
    main_prog = np.full((num_b,), -1, np.int64)
    n_prog = np.zeros((num_b,), np.int64)
    for b in range(num_b):
        progs = np.where(desc == b)[0]
        n_prog[b] = progs.size
        if progs.size:
            main_prog[b] = progs[shared[progs, b].argmax()]
    return ProgenitorLinks(descendant=desc, main_progenitor=main_prog,
                           n_progenitors=n_prog, shared=shared)


@dataclasses.dataclass
class MergerForest:
    """Progenitor links across a full time-ordered snapshot sequence."""
    links: list            # [T-1] ProgenitorLinks (t -> t+1)
    catalogs: list         # [T] HaloCatalog
    scale_factors: list    # [T]

    @classmethod
    def build(cls, catalogs, scale_factors, *, max_halos: int = 256,
              min_shared: int = 10) -> "MergerForest":
        links = []
        for a, b in zip(catalogs[:-1], catalogs[1:]):
            links.append(link_progenitors(
                a.particle_label, b.particle_label,
                num_a=int(a.num_halos), num_b=int(b.num_halos),
                max_halos=max_halos, min_shared=min_shared))
        return cls(links=links, catalogs=list(catalogs),
                   scale_factors=list(scale_factors))

    def main_branch(self, halo_id: int) -> list[tuple[float, int, float]]:
        """Mass accretion history of a final-snapshot halo: walk main
        progenitors backwards. Returns [(a, halo_id, mass)] early->late."""
        out = []
        h = halo_id
        for t in range(len(self.catalogs) - 1, -1, -1):
            if h < 0:
                break
            mass = float(np.asarray(self.catalogs[t].mass)[h])
            out.append((float(self.scale_factors[t]), h, mass))
            if t > 0:
                h = int(self.links[t - 1].main_progenitor[h])
        return list(reversed(out))

    def mergers_into(self, halo_id: int, t: int) -> list[int]:
        """All progenitors at snapshot t-1 that merged into `halo_id`
        at snapshot t."""
        if t == 0:
            return []
        desc = self.links[t - 1].descendant
        return [int(a) for a in np.where(desc == halo_id)[0]]
