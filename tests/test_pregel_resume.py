"""Checkpoint/resume: kill after superstep k, resume from the committed
checkpoint, converge to the identical result (FIXTURES.md §4)."""

import math
import os

from linkgraph.algos import pagerank
from linkgraph.pregel import CheckpointStore


def test_pagerank_resume_identical(tiny_edges, tmp_path):
    ckpt = str(tmp_path / "checkpoints")

    full = pagerank(tiny_edges, tol=1e-6, max_iter=100)
    expected = {r["vid"]: r["score"] for r in full.state.collect()}

    # "killed" run: stop after 3 supersteps, checkpoint every 1
    partial = pagerank(
        tiny_edges, tol=1e-6, max_iter=3, checkpoint_dir=ckpt,
        job_id="pr", checkpoint_every=1,
    )
    assert not partial.converged
    store = CheckpointStore(ckpt, "pr")
    assert store.latest() == 3
    step_dir = os.path.join(ckpt, "pr", "superstep=3")
    assert os.path.exists(os.path.join(step_dir, "_COMMITTED"))
    assert os.path.exists(os.path.join(step_dir, "metrics.json"))

    # fresh invocation resumes from superstep 3 and converges
    resumed = pagerank(
        tiny_edges, tol=1e-6, max_iter=100, checkpoint_dir=ckpt,
        job_id="pr", checkpoint_every=1,
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    # resumed metrics history covers supersteps 1..n continuously
    steps = [m["superstep"] for m in resumed.metrics]
    assert steps == list(range(1, resumed.iterations + 1))
    got = {r["vid"]: r["score"] for r in resumed.state.collect()}
    for v in expected:
        assert math.isclose(got[v], expected[v], rel_tol=0, abs_tol=1e-12)


def test_checkpoint_metrics_have_partition_rows(tiny_edges, tmp_path):
    import json

    ckpt = str(tmp_path / "ck2")
    pagerank(
        tiny_edges, tol=0.0, max_iter=2, checkpoint_dir=ckpt,
        job_id="m", checkpoint_every=2,
    )
    with open(os.path.join(ckpt, "m", "superstep=2", "metrics.json")) as f:
        meta = json.load(f)
    assert meta["superstep"] == 2
    assert len(meta["history"]) == 2
    assert all({"wall_s", "delta", "superstep"} <= set(m) for m in meta["history"])
    assert sum(p["rows"] for p in meta["partitions"]) > 0
    # queryable metrics/lineage parquet rows exist alongside the state
    spark = tiny_edges.sparkSession
    mrows = spark.read.parquet(os.path.join(ckpt, "m", "superstep=2", "metrics_rows"))
    assert [r["superstep"] for r in mrows.orderBy("superstep").collect()] == [1, 2]
    prows = spark.read.parquet(os.path.join(ckpt, "m", "superstep=2", "partition_rows"))
    assert sum(r["rows"] for r in prows.collect()) > 0
