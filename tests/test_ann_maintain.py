"""Retrain-while-serving handover for the streaming IVF-PQ index
(VERDICT r9 directive 6): the drain -> gate -> retrain -> re-attach
loop as one call (``retrain_with_handover``) and one CLI subcommand
(``ann-maintain``), with search proven at every phase:

  - BEFORE the retrain: the standing (stale-geometry) index serves
    correct neighbors for the drifted vectors;
  - DURING the drained window: searches read the last consistent
    index — stale-index-served, never a partial rewrite;
  - AFTER: the rebuilt index serves the same neighbors under the new
    geometry, streamed partitions retired, and the re-attached query
    ingests fresh drops against the NEW frozen centroids.
"""

from __future__ import annotations

import json

from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.operators.pq import ivfpq_topk
from currency_market_pulse_spark.streaming.ivf_stream import (
    TRAIN_BATCH_ID, StreamingIVFPQIndex, retrain_with_handover,
)

_PQ = dict(m=2, sub_dim=2, pq_k=2, pq_iter=1)
_VEC_SCHEMA = "vec_id bigint, embedding array<double>"


def _vecs(spark, items):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in items],
        _VEC_SCHEMA)


def _clusters4(n_per, centers, start_id=0):
    out, vid = [], start_id
    for c in centers:
        for j in range(n_per):
            out.append((vid, [c[0] + 0.01 * (j % 5), c[1] + 0.01 * (j % 3),
                              c[2] - 0.01 * (j % 2), c[3]]))
            vid += 1
    return out


def _index(tmp_path, **kw):
    return StreamingIVFPQIndex(
        centroids_path=str(tmp_path / "idx" / "centroids"),
        assign_path=str(tmp_path / "idx" / "assign"),
        vectors_path=str(tmp_path / "idx" / "vectors"),
        codebooks_path=str(tmp_path / "idx" / "codebooks"),
        codes_path=str(tmp_path / "idx" / "codes"), **_PQ, **kw)


def _drop(stream_dir, name, items):
    stream_dir.mkdir(parents=True, exist_ok=True)
    with open(stream_dir / name, "w") as f:
        for vid, v in items:
            f.write(json.dumps(
                {"vec_id": vid, "embedding": [float(x) for x in v]}) + "\n")


def _search(spark, idx, query_id, k=3):
    """ivfpq_topk over the standing index, exactly as a serving
    deployment composes it."""
    out = ivfpq_topk(
        idx.read_vectors(spark), F.col("vec_id") == query_id,
        k_neighbors=k, m=2, sub_dim=2, k=2, nprobe=2,
        index=(idx.read_centroids(spark), idx.read_codebooks(spark),
               idx.read_members(spark)))
    return [r.neighbor_id for r in out.collect()]


FAR = _clusters4(6, [(50, 50, 50, 50)], start_id=500)
FAR_IDS = {vid for vid, _ in FAR}


def test_handover_serves_before_during_after(spark, tmp_path):
    idx = _index(tmp_path)
    idx.train(_vecs(spark, _clusters4(
        6, [(0, 0, 0, 0), (1, 1, 1, 1)])), k=2)

    # BEFORE any drift: the trained index is correct — a base query's
    # neighbors are its own cluster mates (ids 0-5 share the cell)
    assert set(_search(spark, idx, 0)) <= {1, 2, 3, 4, 5}

    stream_dir = tmp_path / "drops"
    _drop(stream_dir, "far.json", FAR)

    def attach():
        s = spark.readStream.schema(_VEC_SCHEMA).json(str(stream_dir))
        return idx.attach(s, str(tmp_path / "ckpt"))

    q = attach()
    q.processAllAvailable()

    # the drifted cluster is ingested under the STALE geometry and
    # immediately searchable — k results served, though possibly
    # DEGRADED (far residuals collapse under codebooks trained on
    # near-zero residuals: exactly the quality decay the drift gate
    # detects, module docstring)
    before = _search(spark, idx, 500)
    assert len(before) == 3

    # DURING: probe from inside the drained window (ingest stopped,
    # retrain not yet run) — the last consistent index still serves,
    # bit-identically to the pre-drain answer (stale-index-served,
    # never a partial rewrite)
    during: list = []
    report, q2 = retrain_with_handover(
        idx, spark, reattach=attach, query=q,
        on_drained=lambda: during.extend(_search(spark, idx, 500)),
        k=3)
    try:
        assert during == before

        # the distance-growth gate fired on its own (vectors at 50x the
        # training radius), and the rebuild landed
        assert report["gate_fired"] and report["retrained"]
        assert any("distance growth" in r for r in report["reasons"])
        assert report["k"] == 3
        assert idx.read_centroids(spark).count() == 3

        # AFTER: streamed partitions retired, same neighbors under the
        # new geometry (the far cluster now owns a trained centroid)
        for rel in (idx.read_assignments(spark), idx.read_codes(spark)):
            got = {r.batch_id for r in
                   rel.select("batch_id").distinct().collect()}
            assert got == {TRAIN_BATCH_ID}
        after = _search(spark, idx, 500)
        assert len(after) == 3 and set(after) <= FAR_IDS - {500}

        # the RE-ATTACHED query resumes from the drained offset: a
        # fresh drop is ingested once, assigned against the NEW
        # centroids (its cell is the far cluster's new cell)
        _drop(stream_dir, "more.json",
              _clusters4(2, [(50.2, 50.2, 50.2, 50.2)], start_id=700))
        q2.processAllAvailable()
        n = idx.read_vectors(spark).count()
        assert n == 12 + 6 + 2
        # assigned against the NEW geometry: a far-cluster centroid now
        # exists, so the drop's assignment distance is tiny — against
        # any OLD centroid (near the origin) it would be ~10^4
        new_dists = [r.dist for r in idx.read_assignments(spark)
                     .filter(F.col("vec_id") >= 700).collect()]
        assert len(new_dists) == 2 and all(d < 10.0 for d in new_dists)
    finally:
        q2.stop()


def test_ann_maintain_cli(spark, tmp_path, capsys):
    from currency_market_pulse_spark.__main__ import main

    stream_dir = tmp_path / "drops"
    seed_dir = tmp_path / "seed"
    _drop(seed_dir, "base.json",
          _clusters4(6, [(0, 0, 0, 0), (1, 1, 1, 1)]))
    stream_dir.mkdir()
    common = ["ann-maintain", "--index-dir", str(tmp_path / "idx"),
              "--stream-dir", str(stream_dir),
              "--checkpoint", str(tmp_path / "ckpt"),
              "--m", "2", "--sub-dim", "2", "--pq-k", "2"]

    # phase 1: initial offline training from the seed corpus (a
    # separate dir — the live drop zone must not replay it)
    assert main(common + ["--train", "--seed-dir", str(seed_dir),
                          "--k", "2"], spark=spark) == 0
    trained = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert trained == {"trained": True, "k": 2, "n_vectors": 12}

    # phase 2: drift arrives; one maintenance pass ingests it, fires
    # the gate, retrains, re-attaches, and reports
    _drop(stream_dir, "far.json", FAR)
    assert main(common + ["--once", "--k", "3"], spark=spark) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["gate_fired"] and report["retrained"]
    assert report["k"] == 3 and not report["forced"]
    assert report["drift"]["n_streamed"] == 6

    # the rebuilt index is the serving index: planted neighbors found
    idx = _index(tmp_path)
    got = _search(spark, idx, 500)
    assert len(got) == 3 and set(got) <= FAR_IDS - {500}

    # phase 3: no drift, no force -> the pass is a gated no-op
    assert main(common + ["--once"], spark=spark) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not report["retrained"] and not report["gate_fired"]
