"""Broadcast sorted-interval index of cell covers (the "R-tree" of the
north rule, flattened for vectorized lookup).

Cover cells are quadtree cells, so every cover is a set of [lo, hi]
intervals of max-resolution Morton codes.  Intervals from different
features overlap only by nesting (quadtree property), so we flatten all
endpoints into elementary segments and store, per segment, the CSR list
of features active there.  Point lookup is then ONE numpy searchsorted
per batch of points + a CSR gather — no per-row Python, no shuffle.

The index is built once per polygon-layer snapshot, broadcast via
SparkContext.broadcast, and consulted inside mapInPandas kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class IntervalIndex:
    bounds: np.ndarray   # (S+1,) segment boundaries, sorted
    offsets: np.ndarray  # (S+1,) CSR offsets into fids
    fids: np.ndarray     # (NNZ,) feature ids active per segment

    @staticmethod
    def build(feature_ids: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> "IntervalIndex":
        feature_ids = np.asarray(feature_ids, dtype=np.int64)
        lo = np.asarray(lo, dtype=np.int64)
        hi = np.asarray(hi, dtype=np.int64)
        if len(lo) == 0:
            return IntervalIndex(np.array([0], dtype=np.int64), np.zeros(2, dtype=np.int64), np.empty(0, dtype=np.int64))
        # elementary segment boundaries: starts and (hi+1) ends
        bounds = np.unique(np.concatenate([lo, hi + 1]))
        # map each interval to its covered segment range
        s_start = np.searchsorted(bounds, lo, side="right") - 1
        s_end = np.searchsorted(bounds, hi + 1, side="right") - 1  # exclusive
        seg_count = len(bounds)  # last boundary opens a trailing empty segment
        counts = np.zeros(seg_count + 1, dtype=np.int64)
        np.add.at(counts, s_start, 1)
        np.add.at(counts, s_end, -1)
        active = np.cumsum(counts[:-1])  # actives per segment
        offsets = np.zeros(seg_count + 1, dtype=np.int64)
        offsets[1:] = np.cumsum(active)
        # fill CSR by iterating intervals (vectorized per interval span)
        fids = np.empty(offsets[-1], dtype=np.int64)
        cursor = offsets[:-1].copy()
        order = np.argsort(s_start, kind="stable")
        for i in order:
            a, b = s_start[i], s_end[i]
            for s in range(a, b):
                fids[cursor[s]] = feature_ids[i]
                cursor[s] += 1
        return IntervalIndex(bounds, offsets, fids)

    def query(self, points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """points: (P,) max-res Morton codes → (point_idx, feature_id)
        candidate pairs, fully vectorized."""
        points = np.asarray(points, dtype=np.int64)
        seg = np.searchsorted(self.bounds, points, side="right") - 1
        valid = (seg >= 0) & (seg < len(self.offsets) - 1)
        seg = np.clip(seg, 0, len(self.offsets) - 2)
        start = self.offsets[seg]
        end = self.offsets[seg + 1]
        n = np.where(valid, end - start, 0)
        total = int(n.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        point_idx = np.repeat(np.arange(len(points)), n)
        # vectorized CSR multi-range gather: for each emitted slot, its
        # offset within the owning range, added to that range's start
        excl = np.concatenate([[0], np.cumsum(n)[:-1]])
        within = np.arange(total) - np.repeat(excl, n)
        flat = np.repeat(start, n) + within
        return point_idx, self.fids[flat]
