"""End-to-end: 8 fixture change batches through the distributed pipeline,
golden-compared against the independent Python oracle, plus closure
parity and crash-resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from augdiff_pipeline_spark import fixtures
from augdiff_pipeline_spark.operators.closure import edges_from_rows, transitive_closure
from augdiff_pipeline_spark.plans.augdiff import run_batch
from augdiff_pipeline_spark.plans.lineage import LineageLog
from augdiff_pipeline_spark.schemas import INDEX_SCHEMA
from augdiff_pipeline_spark.sources.catalog import SnapshotTable
from augdiff_pipeline_spark.sources.state import StateTable

import oracle_augdiff as oracle


def canon(features):
    """Order-insensitive canonical form for a feature set."""
    return sorted(json.dumps(f, sort_keys=True) for f in features)


def test_batch_index_closure_matches_oracle(spark):
    base = fixtures.base_state_rows()
    expected = {(a, b) for a, b in oracle.close_edges(oracle.edges_from_rows(base)) if a != b}
    df = fixtures.base_state_df(spark)
    got = {
        (r["a"], r["b"])
        for r in transitive_closure(edges_from_rows(df)).collect()
    }
    assert got == expected


def test_incremental_closure_paths_agree(spark):
    """The driver-side small-component closure (the minutely fast path,
    reference ComputeIndexLocal shape) and the distributed doubling
    fixpoint must produce identical (new_edges, all_edges) — forced by
    routing the same batch through both via the size threshold."""
    from augdiff_pipeline_spark.operators.closure import incremental_closure

    base_df = fixtures.base_state_df(spark)
    index_df = transitive_closure(edges_from_rows(base_df))
    for seq in (0, 2, 5, 6):  # node/way edits, tombstones, new relations
        batch = fixtures.change_batch_df(spark, seq)
        out = {}
        for label, thr in (("driver", 200_000), ("distributed", 0)):
            ne, ae = incremental_closure(index_df, batch, small_component_edges=thr)
            out[label] = (
                {(r["a"], r["b"]) for r in ne.collect()},
                {(r["a"], r["b"]) for r in ae.collect()},
            )
        assert out["driver"] == out["distributed"], f"seq {seq}"


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    """Run all 8 batches once; share results across assertions."""
    root = str(tmp_path_factory.mktemp("augdiff"))
    state = StateTable(os.path.join(root, "state"))
    index = SnapshotTable(os.path.join(root, "index"))
    log = LineageLog(os.path.join(root, "log"))
    out_dir = os.path.join(root, "out")

    base_df = fixtures.base_state_df(spark)
    state.init(base_df)
    init_index = transitive_closure(edges_from_rows(base_df))
    index.overwrite(init_index)

    batches = fixtures.change_batch_rows()
    results = {}
    for seq in sorted(batches):
        batch_df = fixtures.change_batch_df(spark, seq)
        results[seq] = run_batch(spark, state, index, log, batch_df, seq, out_dir)

    expected, final_index = oracle.run_sequence(fixtures.base_state_rows(), batches)
    return {
        "root": root, "state": state, "index": index, "log": log,
        "out_dir": out_dir, "results": results,
        "expected": expected, "expected_index": final_index,
    }


def read_features(out_dir, seq):
    import glob

    path = os.path.join(out_dir, f"seq={seq:09d}")
    lines = []
    for f in glob.glob(os.path.join(path, "part-*")):
        with open(f) as fh:
            lines.extend(l for l in fh.read().splitlines() if l)
    return [json.loads(l) for l in lines]


def test_all_batches_match_oracle(pipeline_run):
    for seq, exp in pipeline_run["expected"].items():
        got = read_features(pipeline_run["out_dir"], seq)
        assert canon(got) == canon(exp), f"batch {seq}: {len(got)} vs {len(exp)} features"


def test_final_index_matches_oracle(spark, pipeline_run):
    got = {
        (r["a"], r["b"])
        for r in pipeline_run["index"].read(spark, schema=INDEX_SCHEMA).distinct().collect()
    }
    assert got == pipeline_run["expected_index"]


def test_scenarios_present(pipeline_run):
    """Spot-check the hard scenarios from FIXTURES.md §2."""
    exp = pipeline_run["expected"]
    out = pipeline_run["out_dir"]

    # seq0: node create (1 feature) + node modify (2) + indirectly-dirtied
    # way 2000 (modify: 2 features)
    f0 = read_features(out, 0)
    by = lambda fs, t, i: [f for f in fs if f["properties"]["id"] == i and f["properties"]["type"] == t]
    assert len(by(f0, "node", 1100)) == 1  # create → 1 visible
    assert len(by(f0, "node", 1001)) == 2  # modify → after + invisible before
    assert len(by(f0, "way", 2000)) == 2   # indirect dirtiness (node moved)
    w_after = [f for f in by(f0, "way", 2000) if f["properties"]["visible"]][0]
    assert w_after["geometry"]["type"] == "Polygon"  # building => area

    # seq2: node delete → single invisible feature
    f2 = read_features(out, 2)
    d = by(f2, "node", 1050)
    assert len(d) == 1 and d[0]["properties"]["visible"] is False

    # seq3: inner-ring node move dirties multipolygon r3000
    f3 = read_features(out, 3)
    r = by(f3, "relation", 3000)
    assert len(r) == 2
    after = [f for f in r if f["properties"]["visible"]][0]
    assert after["geometry"]["type"] == "Polygon"
    assert len(after["geometry"]["coordinates"]) == 2  # outer + hole

    # seq4/seq7: way/relation deletes emit NO feature — reference parity:
    # a tombstone has empty nds/members (ChangeAugmenter.scala:28-51), so
    # it contributes no edges (ComputeIndexLocal.scala:20-47), nothing of
    # its component is fetched, and the before-row fails the completeness
    # predicate (RowsToJson.scala:127-133/183-196).  Only node deletes
    # (complete ≡ true) render a tombstone feature.
    f4 = read_features(out, 4)
    assert by(f4, "way", 2002) == []
    f7 = read_features(out, 7)
    assert by(f7, "relation", 3005) == []
    # ...but the way modified in the same batch renders normally
    assert len(by(f7, "way", 2012)) == 2

    # seq8: overlapping outer rings dissolve into a UNION polygon (the
    # reference's JTS unaryUnion step, osm/package.scala:461-468) — not a
    # GeometryCollection fallback
    f8 = read_features(out, 8)
    r4 = by(f8, "relation", 3004)
    assert len(r4) == 2  # modify: after + invisible before
    for feat in r4:
        assert feat["geometry"]["type"] == "Polygon", feat["geometry"]["type"]
        assert len(feat["geometry"]["coordinates"]) == 1  # single dissolved ring
        # union boundary: 8 corners minus 2 swallowed, plus 2 crossing
        # points = 8 distinct vertices, 9 rows with ring closure
        assert len(feat["geometry"]["coordinates"][0]) == 9


def test_resume_after_partial_commit(spark, pipeline_run, tmp_path):
    """Crash between state append and lineage commit → resume reruns the
    batch idempotently after rollback."""
    root = str(tmp_path)
    state = StateTable(os.path.join(root, "state"))
    index = SnapshotTable(os.path.join(root, "index"))
    log = LineageLog(os.path.join(root, "log"))
    out_dir = os.path.join(root, "out")

    base_df = fixtures.base_state_df(spark)
    state.init(base_df)
    index.overwrite(transitive_closure(edges_from_rows(base_df)))

    batches = fixtures.change_batch_rows()
    run_batch(spark, state, index, log, fixtures.change_batch_df(spark, 0), 0, out_dir)

    # simulate crash mid-batch-1: state appended but no lineage commit
    state.append_batch(fixtures.change_batch_df(spark, 1), 1)
    from augdiff_pipeline_spark.plans.runner import resume_and_run

    results = resume_and_run(
        spark, state, index, log, out_dir,
        batches={s: (lambda s=s: fixtures.change_batch_df(spark, s)) for s in sorted(batches)},
    )
    # every batch committed exactly once
    assert log.committed_seqs(spark) == sorted(batches)
    # outputs identical to the uninterrupted run
    for seq, exp in pipeline_run["expected"].items():
        got = read_features(out_dir, seq)
        assert canon(got) == canon(exp), f"resume batch {seq}"
    # state contains each row exactly once (the partial pre-crash append
    # was rolled back, not double-applied; rollback keeps history, so we
    # assert on current-snapshot content, not on the snapshot log)
    sdf = state.read(spark)
    total = sdf.count()
    expected_total = len(fixtures.base_state_rows()) + sum(len(v) for v in batches.values())
    assert total == expected_total
    assert sdf.select("id", "type", "version").distinct().count() == total
