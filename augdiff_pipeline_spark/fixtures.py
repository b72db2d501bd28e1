"""Deterministic synthetic fixtures (seed-fixed, no external data).

One small OSM-style world + K=8 minutely change batches exercising every
augmented-diff scenario from FIXTURES.md §2 (create/modify/delete across
nodes/ways/relations, a split-outer multipolygon with an inner ring, a
relation-of-relations, indirect dirtiness via node moves, cross-batch and
same-batch double changes, tombstone rows shaped per
/root/reference/ad/src/main/scala/ChangeAugmenter.scala:28-51), plus the
image+caption fact table from BASELINE.json input_hint with Zipf-hot
geotags for skew-handling tests.

Entity id ranges are disjoint across types (nodes 1xxx, ways 2xxx,
relations 3xxx) — see SURVEY.md §3 note on the reference's cross-type id
collision hazard in its emission map merge.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import numpy as np
import pandas as pd

from .functions.packing import partition_number_py
from .operators import images as imgcodec
from .schemas import IMAGE_SCHEMA, OSM_SCHEMA

SEED = 42
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

# ----------------------------------------------------------------- geometry
NODE_COORDS: dict[int, tuple[float, float]] = {}  # id -> (lon, lat)


def _put_nodes(start_id: int, coords: list[tuple[float, float]]) -> list[int]:
    ids = []
    for i, (lon, lat) in enumerate(coords):
        NODE_COORDS[start_id + i] = (lon, lat)
        ids.append(start_id + i)
    return ids


# building square (area way)
SQ1 = _put_nodes(1000, [(10.010, 50.010), (10.020, 50.010), (10.020, 50.020), (10.010, 50.020)])
# closed highway (non-area -> Line)
SQ2 = _put_nodes(1010, [(10.030, 50.010), (10.040, 50.010), (10.040, 50.020), (10.030, 50.020)])
# open road
RD = _put_nodes(1020, [(10.000, 50.000), (10.010, 50.002), (10.020, 50.004), (10.030, 50.006), (10.040, 50.008)])
# multipolygon outer corners (split across two open ways)
MPO = _put_nodes(1030, [(10.050, 50.050), (10.080, 50.050), (10.080, 50.080), (10.050, 50.080)])
# multipolygon inner ring corners
MPI = _put_nodes(1040, [(10.060, 50.060), (10.070, 50.060), (10.070, 50.070), (10.060, 50.070)])
# standalone node (deleted mid-sequence)
LONER = _put_nodes(1050, [(10.090, 50.010)])
# route polyline
RT = _put_nodes(1060, [(10.000, 50.090), (10.010, 50.092), (10.020, 50.094), (10.030, 50.096), (10.040, 50.098)])
# overlapping multipolygon outers (two closed squares sharing a corner
# region — exercises the dissolveRings union, reference :461-468)
OVA = _put_nodes(1200, [(10.100, 50.100), (10.120, 50.100), (10.120, 50.120), (10.100, 50.120)])
OVB = _put_nodes(1210, [(10.110, 50.110), (10.130, 50.110), (10.130, 50.130), (10.110, 50.130)])
# filler POI nodes
_rng = np.random.default_rng(SEED)
FILLER = _put_nodes(
    1070,
    [(round(10.0 + 0.001 * i, 7), round(50.03 + 0.0007 * i, 7)) for i in range(20)],
)

WAYS: dict[int, dict] = {
    2000: {"nds": SQ1 + [SQ1[0]], "tags": {"building": "yes", "name": "block a"}},
    2001: {"nds": SQ2 + [SQ2[0]], "tags": {"highway": "residential"}},
    2002: {"nds": RD, "tags": {"highway": "tertiary"}},
    2003: {"nds": [MPO[0], MPO[1], MPO[2]], "tags": {}},
    2004: {"nds": [MPO[2], MPO[3], MPO[0]], "tags": {}},
    2005: {"nds": MPI + [MPI[0]], "tags": {}},
    2006: {"nds": RT[:3], "tags": {"railway": "rail"}},
    2007: {"nds": RT[2:], "tags": {"railway": "rail"}},
    2008: {"nds": OVA + [OVA[0]], "tags": {}},
    2009: {"nds": OVB + [OVB[0]], "tags": {}},
}

RELATIONS: dict[int, dict] = {
    3000: {
        "members": [("way", 2003, "outer"), ("way", 2004, "outer"), ("way", 2005, "inner")],
        "tags": {"type": "multipolygon", "landuse": "forest"},
    },
    3001: {
        "members": [("relation", 3000, ""), ("node", SQ1[0], "")],
        "tags": {"name": "compound"},
    },
    3002: {  # incomplete: way 2999 never exists -> never renderable
        "members": [("way", 2999, "outer")],
        "tags": {"type": "multipolygon"},
    },
    3003: {
        "members": [("way", 2006, ""), ("way", 2007, "")],
        "tags": {"type": "multilinestring"},
    },
    3004: {  # overlapping outers -> dissolved union polygon
        "members": [("way", 2008, "outer"), ("way", 2009, "outer")],
        "tags": {"type": "multipolygon", "natural": "water"},
    },
}


def _ts(hours: float, minutes: float = 0.0) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours, minutes=minutes)


def _node_row(nid, version, ts, *, lon=None, lat=None, tags=None, visible=True, changeset=100, uid=7, user="synth"):
    lon0, lat0 = NODE_COORDS.get(nid, (None, None))
    lon = lon if lon is not None else lon0
    lat = lat if lat is not None else lat0
    return (
        partition_number_py(nid, "node"),
        nid,
        "node",
        tags or {},
        Decimal(f"{lat:.7f}") if lat is not None else None,
        Decimal(f"{lon:.7f}") if lon is not None else None,
        [],
        [],
        changeset,
        ts,
        uid,
        user,
        version,
        visible,
    )


def _way_row(wid, version, ts, *, nds, tags=None, visible=True, changeset=100, uid=7, user="synth"):
    return (
        partition_number_py(wid, "way"),
        wid,
        "way",
        tags or {},
        None,
        None,
        [(int(r),) for r in nds],
        [],
        changeset,
        ts,
        uid,
        user,
        version,
        visible,
    )


def _rel_row(rid, version, ts, *, members, tags=None, visible=True, changeset=100, uid=7, user="synth"):
    return (
        partition_number_py(rid, "relation"),
        rid,
        "relation",
        tags or {},
        None,
        None,
        [],
        [(t, int(r), role) for (t, r, role) in members],
        changeset,
        ts,
        uid,
        user,
        version,
        visible,
    )


def _tombstone(eid, etype, version, ts):
    """Delete tombstone — shape per ChangeAugmenter.scala:28-51: empty
    tags/nds/members, null changeset/uid/user/lat/lon, visible=false."""
    return (
        partition_number_py(eid, etype),
        eid,
        etype,
        {},
        None,
        None,
        [],
        [],
        None,
        ts,
        None,
        None,
        version,
        False,
    )


def base_state_rows() -> list[tuple]:
    rows = []
    for i, nid in enumerate(sorted(NODE_COORDS)):
        tags = {"amenity": "cafe"} if nid in FILLER[:3] else {}
        rows.append(_node_row(nid, 1, _ts(0, i % 7), tags=tags))
    for wid, spec in WAYS.items():
        rows.append(_way_row(wid, 1, _ts(0, 10 + wid % 5), nds=spec["nds"], tags=spec["tags"]))
    for rid, spec in RELATIONS.items():
        rows.append(_rel_row(rid, 1, _ts(0, 20 + rid % 5), members=spec["members"], tags=spec["tags"]))
    return rows


def change_batch_rows() -> dict[int, list[tuple]]:
    """seq -> change rows (engine infers create/modify/delete from
    version/visible exactly as the reference does)."""
    b: dict[int, list[tuple]] = {}
    b[0] = [
        _node_row(1100, 1, _ts(1), lon=10.015, lat=50.015, tags={"amenity": "bench"}),
        _node_row(1001, 2, _ts(1, 1), lon=10.022, lat=50.008),  # moves corner of w2000
    ]
    b[1] = [
        _node_row(1101, 1, _ts(2), lon=10.016, lat=50.016),
        _node_row(1101, 2, _ts(2, 1), lon=10.017, lat=50.017),  # same-batch double change
        _way_row(2012, 1, _ts(2, 2), nds=[1100, 1101, FILLER[0]], tags={"highway": "path"}),
    ]
    b[2] = [
        _way_row(2001, 2, _ts(3), nds=WAYS[2001]["nds"], tags={"highway": "residential", "name": "ring rd"}),
        _tombstone(1050, "node", 2, _ts(3, 1)),
    ]
    b[3] = [
        _node_row(1040, 2, _ts(4), lon=10.058, lat=50.058),  # inner-ring corner moves -> w2005, r3000 dirty
    ]
    b[4] = [
        _tombstone(2002, "way", 2, _ts(5)),
        _node_row(1030, 2, _ts(5, 1), lon=10.048, lat=50.048),  # outer corner moves -> w2003/w2004/r3000
    ]
    b[5] = [
        _rel_row(3005, 1, _ts(6), members=[("way", 2000, "outer")], tags={"type": "multipolygon"}),
        _node_row(1001, 3, _ts(6, 1), lon=10.023, lat=50.007),  # 2nd cross-batch change
    ]
    b[6] = [
        _node_row(1102, 1, _ts(7), lon=10.091, lat=50.011),
        _rel_row(3001, 2, _ts(7, 1), members=[("relation", 3000, ""), ("node", SQ1[0], ""), ("node", 1102, "")], tags={"name": "compound"}),
    ]
    b[7] = [
        _tombstone(3005, "relation", 2, _ts(8)),
        _way_row(2012, 2, _ts(8, 1), nds=[1100, 1101, FILLER[0], FILLER[1]], tags={"highway": "path"}),
    ]
    b[8] = [
        # corner of overlapping-outer square moves -> w2008 + r3004 dirty;
        # r3004 must re-render as the DISSOLVED union polygon
        _node_row(1200, 2, _ts(9), lon=10.098, lat=50.098),
    ]
    return b


def base_state_df(spark):
    return spark.createDataFrame(base_state_rows(), OSM_SCHEMA)


def dense_grid_state_rows(n: int = 10, id_base: int = 10_000_000) -> list[tuple]:
    """An n x n grid of closed building ways tiling the fixture bbox
    [10, 10.2] x [50, 50.2] — a denser polygon layer for flagship /
    skew exercises (ids disjoint from the base fixture world)."""
    rows = []
    t = _ts(0, 0)
    nid = id_base
    for gy in range(n):
        for gx in range(n):
            x0 = 10.0 + 0.2 * gx / n
            y0 = 50.0 + 0.2 * gy / n
            w = 0.16 / n
            h = 0.16 / n
            corners = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]
            ids = []
            for lon, lat in corners:
                rows.append(_node_row(nid, 1, t, lon=lon, lat=lat))
                ids.append(nid)
                nid += 1
            rows.append(
                _way_row(
                    id_base + 500_000 + gy * n + gx, 1, t,
                    nds=ids + [ids[0]], tags={"building": "yes"},
                )
            )
    return rows


def dense_grid_state_df(spark, n: int = 10, id_base: int = 10_000_000):
    return spark.createDataFrame(dense_grid_state_rows(n, id_base), OSM_SCHEMA)


def change_batch_df(spark, seq: int):
    return spark.createDataFrame(change_batch_rows()[seq], OSM_SCHEMA)


def soak_batch_rows(n_batches: int = 50) -> dict[int, list[tuple]]:
    """Deterministic long-horizon change feed appended after the K=8
    scenario batches — the reference's actual operating mode is an
    unbounded minutely sequence (AugmentedDiff.scala:206-233), so soak
    tests drive 50+ batches through the streaming path and assert the
    compaction/expiry invariants hold at steady state.

    Each batch: a filler-POI node move (rolling versions tracked across
    the whole prior sequence); every 3rd batch additionally moves a
    way-corner node (indirect way dirtiness); every 5th bumps a way's
    tags; every 7th creates an ephemeral node that a later batch
    tombstones.  Versions/coords continue from wherever
    ``change_batch_rows`` left each entity, so the combined sequence is
    a valid OSM history the pure-Python oracle replays identically.
    """
    prior = change_batch_rows()
    start_seq = max(prior) + 1

    # replay base + prior batches to learn current version/coords/state
    ver: dict[tuple[int, str], int] = {}
    coords: dict[int, tuple[float, float]] = dict(NODE_COORDS)
    alive: dict[tuple[int, str], bool] = {}
    ID, TYPE, LAT, LON, VERSION, VISIBLE = 1, 2, 4, 5, 12, 13
    for r in base_state_rows():
        ver[(r[ID], r[TYPE])] = r[VERSION]
        alive[(r[ID], r[TYPE])] = True
    for s in sorted(prior):
        for r in prior[s]:
            key = (r[ID], r[TYPE])
            ver[key] = r[VERSION]
            alive[key] = r[VISIBLE]
            if r[TYPE] == "node" and r[LON] is not None:
                coords[r[ID]] = (float(r[LON]), float(r[LAT]))

    def bump(eid: int, etype: str) -> int:
        key = (eid, etype)
        ver[key] = ver.get(key, 0) + 1
        alive[key] = True
        return ver[key]

    # A corner move indirectly dirties every way whose nds contain the
    # node — including TOMBSTONED ways: the tombstone (empty nds) never
    # satisfies the window predicate, so the way's older visible version
    # would become the in-window row and the batch would "resurrect" a
    # deleted way, whose before-geometry (the empty-nds tombstone) is
    # undefined in the reference (RowsToJson.scala's way predicates are
    # vacuous over empty nds).  Only move corners whose containing ways
    # are all still alive.
    dead_ways = {w for w, _s in WAYS.items() if not alive.get((w, "way"), True)}
    way_corners = [
        nid
        for nid in (SQ2 + RD)
        if alive.get((nid, "node"), False)
        and not any(nid in WAYS[w]["nds"] for w in dead_ways)
    ]
    ephemeral: list[int] = []  # created, not yet tombstoned
    out: dict[int, list[tuple]] = {}
    for i in range(n_batches):
        seq = start_seq + i
        t = lambda m: _ts(seq + 1, m)  # noqa: E731 — per-batch timestamps
        rows: list[tuple] = []
        # steady POI churn: move one filler node a deterministic nudge
        nid = FILLER[i % len(FILLER)]
        lon, lat = coords[nid]
        lon, lat = round(lon + 0.0001, 7), round(lat + 0.00007, 7)
        coords[nid] = (lon, lat)
        rows.append(_node_row(nid, bump(nid, "node"), t(0), lon=lon, lat=lat))
        if i % 3 == 0:
            cid = way_corners[(i // 3) % len(way_corners)]
            lon, lat = coords[cid]
            lon, lat = round(lon + 0.00005, 7), round(lat + 0.00005, 7)
            coords[cid] = (lon, lat)
            rows.append(_node_row(cid, bump(cid, "node"), t(1), lon=lon, lat=lat))
        if i % 5 == 0:
            # way 2001 stays visible through the whole prior sequence —
            # resurrection-of-a-deleted-way (e.g. 2002, tombstoned at
            # seq 4) has undefined before-geometry semantics in the
            # reference (empty nds) and is deliberately not generated
            wid = 2001
            rows.append(
                _way_row(
                    wid, bump(wid, "way"), t(2), nds=WAYS[wid]["nds"],
                    tags={"highway": "residential", "lanes": str(1 + i % 3)},
                )
            )
        if i % 7 == 0:
            new_id = 5000 + i
            coords[new_id] = (round(10.005 + 0.0002 * i, 7), round(50.095 - 0.0001 * i, 7))
            lon, lat = coords[new_id]
            rows.append(
                _node_row(new_id, bump(new_id, "node"), t(3), lon=lon, lat=lat,
                          tags={"amenity": "bench"})
            )
            ephemeral.append(new_id)
        if i % 7 == 3 and ephemeral:
            gone = ephemeral.pop(0)
            rows.append(_tombstone(gone, "node", bump(gone, "node"), t(4)))
            alive[(gone, "node")] = False
        out[seq] = rows
    return out


def soak_batch_df(spark, rows: list[tuple]):
    return spark.createDataFrame(rows, OSM_SCHEMA)


# -------------------------------------------------------------- image table
CAPTION_WORDS = [
    "aerial", "view", "of", "the", "river", "bridge", "rooftop", "garden",
    "straße", "café", "plaza", "北京", "skyline", "at", "dusk", "park",
    "intersection", "market", "habor", "línea",
]


def image_rows(n: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic image+caption table with Zipf-hot geotags.

    ~85% of points cluster around 20 centers with Zipf(1.5) weights (a
    few cells go hot — exercises salted repartition); 15% uniform over a
    box that extends beyond the polygon layer (outside points).
    """
    rng = np.random.default_rng(seed)
    centers = np.stack(
        [
            rng.uniform(10.0, 10.1, 20),  # lon
            rng.uniform(50.0, 50.1, 20),  # lat
        ],
        axis=1,
    )
    # make the first two centers sit inside known polygons
    centers[0] = (10.065, 50.065)  # inside r3000 outer, outside inner hole
    centers[1] = (10.015, 50.015)  # inside w2000 building
    zipf_w = 1.0 / np.arange(1, 21) ** 1.5
    zipf_w /= zipf_w.sum()

    which = rng.random(n)
    cidx = rng.choice(20, size=n, p=zipf_w)
    lon = np.where(
        which < 0.85,
        centers[cidx, 0] + rng.normal(0, 0.002, n),
        rng.uniform(9.95, 10.15, n),
    )
    lat = np.where(
        which < 0.85,
        centers[cidx, 1] + rng.normal(0, 0.002, n),
        rng.uniform(49.95, 50.15, n),
    )

    ids, blobs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for i in range(n):
        r = np.random.default_rng(seed * 1_000_003 + i)
        w = int(r.integers(16, 65))
        h = int(r.integers(16, 65))
        arr = r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = "png" if i % 2 == 0 else "jpeg"
        blob = imgcodec.encode(arr, fmt)
        words = [CAPTION_WORDS[j] for j in r.integers(0, len(CAPTION_WORDS), 6)]
        ids.append(f"img_{i:08d}")
        blobs.append(blob)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(" ".join(words))
        hashes.append(imgcodec.phash64(imgcodec.decode(blob)))
    return pd.DataFrame(
        {
            "image_id": ids,
            "bytes": blobs,
            "w": ws,
            "h": hs,
            "fmt": fmts,
            "caption": caps,
            "phash": hashes,
            "lat": np.round(lat, 7),
            "lon": np.round(lon, 7),
        }
    )


def image_df(spark, n: int, seed: int = SEED):
    return spark.createDataFrame(image_rows(n, seed), IMAGE_SCHEMA)
