"""Sinks (partitioned/bucketed parquet) and the custom stateful
streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_write_partitioned_prunes(spark, tmp_path):
    from yardstick_spark.plans import explain_str
    from yardstick_spark.sources import read_table, write_partitioned

    ev = read_table(spark, "/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter("event_type = 'click'")
    # partition pruning: only the click directory is scanned
    assert back.count() == ev.filter("event_type = 'click'").count()
    assert "PartitionFilters: [" in explain_str(back)


def test_write_bucketed_skips_shuffle(spark, tmp_path):
    from yardstick_spark.plans import explain_str
    from yardstick_spark.sources import read_bucketed, write_bucketed

    ev = spark.range(0, 1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("v")
    )
    write_bucketed(ev, "ev_bucketed_a", ["user_id"], num_buckets=4)
    write_bucketed(ev, "ev_bucketed_b", ["user_id"], num_buckets=4)
    a = read_bucketed(spark, "ev_bucketed_a")
    b = read_bucketed(spark, "ev_bucketed_b")
    # tiny test tables would broadcast (which also skips the shuffle);
    # disable it to show the bucketed SortMergeJoin path has no Exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        assert joined.count() == 1000
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_stateful_user_activity(spark, tmp_path):
    from yardstick_spark.streaming import stream_events, user_activity_stats

    sf = "/root/testdata/sf0.001"
    stats = user_activity_stats(stream_events(spark, sf))
    q = (
        stats.writeStream.format("memory")
        .queryName("activity_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # with processing-time timeouts registered the query stays alive to
    # fire them — drain the data batch, then stop explicitly
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] > 0 \
                and q.status["isDataAvailable"] is False:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)
    got = {r["user_id"]: r for r in spark.table("activity_test").collect()}
    from yardstick_spark.sources import read_table

    want = {
        r["user_id"]: r
        for r in read_table(spark, f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("value_sum"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, row in want.items():
        assert got[uid]["n_events"] == row["n_events"]
        assert abs(got[uid]["value_sum"] - row["value_sum"]) < 0.01


def test_csv_json_round_trip(spark, tmp_path):
    # the reference delegates IO to its host engine; our equivalent
    # surface must read back csv/json it wrote with values intact
    from yardstick_spark.sources import read_table

    src = read_table(spark, "/root/testdata/sf0.001/nation.parquet")
    want = sorted(tuple(r) for r in src.collect())

    csv_dir = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(csv_dir)
    got_csv = read_table(spark, csv_dir, fmt="csv")
    assert sorted(tuple(r) for r in got_csv.collect()) == want

    json_dir = str(tmp_path / "nation_json")
    src.write.json(json_dir)
    got_json = read_table(spark, json_dir, fmt="json")
    # JSON readers order columns lexicographically; realign to source
    got_json = got_json.select(*src.columns)
    assert sorted(tuple(r) for r in got_json.collect()) == want


def test_orc_round_trip(spark, tmp_path):
    # ORC is Spark-native; read_table's fmt passthrough covers it
    from yardstick_spark.sources import read_table

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation.orc")
    df.write.mode("overwrite").orc(path)
    back = read_table(spark, path, fmt="orc")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_dedup_ingest_stream_equals_batch(spark, tmp_path):
    # streaming probe of the persisted signature store must produce the
    # same pair SET as the batch operator (per-band duplicates allowed
    # on the streaming-native path; none in this corpus below bands=8)
    from yardstick_spark.llm import (
        clear_dedup_caches,
        incremental_minhash_pairs,
        minhash_signatures,
        save_dedup_signatures,
    )
    from yardstick_spark.streaming import dedup_ingest_stream

    clear_dedup_caches()
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus = docs.filter("doc_id % 5 <> 0")
    store = str(tmp_path / "sigstore")
    save_dedup_signatures(minhash_signatures(corpus), store)

    # stream the "new batch" docs from a parquet dir
    new_dir = str(tmp_path / "incoming")
    docs.filter("doc_id % 5 = 0").select("doc_id", "text").write.parquet(new_dir)
    schema = spark.read.parquet(new_dir).schema
    stream = spark.readStream.schema(schema).parquet(new_dir)
    pairs = dedup_ingest_stream(stream, spark, store)
    # every join must be stream-static: exactly ONE streaming source in
    # the plan (a stream-stream self-join would buffer unbounded state
    # and rematch stale rows on recurring doc_ids)
    n_stream_sources = str(
        pairs._jdf.queryExecution().logical()
    ).count("StreamingRelation")
    assert n_stream_sources == 1, n_stream_sources
    q = (
        pairs.writeStream.format("memory")
        .queryName("ingest_pairs_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in
           spark.table("ingest_pairs_test")
           .select("new_id", "corpus_id", "est_jaccard").collect()}
    want = {tuple(r) for r in
            incremental_minhash_pairs(
                docs.filter("doc_id % 5 = 0"),
                corpus).collect()}
    assert got == want and got, f"stream {len(got)} vs batch {len(want)}"
    clear_dedup_caches()


def test_write_sorted_skips_files_on_range_predicate(spark, tmp_path):
    import glob

    from yardstick_spark.plans import explain_str
    from yardstick_spark.sources import write_sorted

    ev = spark.range(0, 100_000).selectExpr(
        "id AS k", "id % 97 AS payload"
    )
    out = str(tmp_path / "sorted")
    write_sorted(ev, out, ["k"], target_files=8)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == 8
    # disjoint ranges: each file's keys must not overlap its neighbors
    bounds = []
    for f in files:
        mm = spark.read.parquet(f).selectExpr(
            "min(k) AS lo", "max(k) AS hi").collect()[0]
        bounds.append((mm["lo"], mm["hi"]))
    bounds.sort()
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2, f"overlapping file ranges {hi1} >= {lo2}"
    back = spark.read.parquet(out).filter("k BETWEEN 10 AND 20")
    plan = explain_str(back)
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(k,10)" in plan
    assert back.count() == 11


def test_semantic_ingest_stream_equals_batch(spark, tmp_path):
    # streaming IVF-index probe must produce the same pair set as the
    # batch twin, with a single streaming source (stream-static only)
    from yardstick_spark.llm import (
        build_ivf_index, save_ivf_index, semantic_pairs_against_index,
    )
    from yardstick_spark.streaming import semantic_ingest_stream

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter("vec_id % 5 <> 0")
    new = emb.filter("vec_id % 5 = 0")
    idx = str(tmp_path / "ivf_idx")
    assigned, cents = build_ivf_index(corpus, n_lists=4, seed=7)
    save_ivf_index(assigned, cents, idx)

    new_dir = str(tmp_path / "incoming_vecs")
    new.write.parquet(new_dir)
    schema = spark.read.parquet(new_dir).schema
    stream = spark.readStream.schema(schema).parquet(new_dir)
    pairs = semantic_ingest_stream(stream, spark, idx,
                                   threshold=0.3, n_probe=2)
    n_stream_sources = str(
        pairs._jdf.queryExecution().logical()
    ).count("StreamingRelation")
    assert n_stream_sources == 1, n_stream_sources
    q = (
        pairs.writeStream.format("memory")
        .queryName("sem_ingest_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sem"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("sem_ingest_test").collect()}
    want = {tuple(r) for r in semantic_pairs_against_index(
        new, spark, idx, threshold=0.3, n_probe=2).collect()}
    assert got == want and got, f"stream {len(got)} vs batch {len(want)}"


def test_zorder_key_matches_reference(spark):
    from pyspark.sql import functions as F

    from yardstick_spark.sources.write import zorder_key_expr

    def morton(vals, bits):
        out = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                out |= ((v >> i) & 1) << (i * len(vals) + j)
        return out

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 4095) for y in (0, 3, 77, 4095)],
        "x INT, y INT")
    rows = df.withColumn(
        "z", F.expr(zorder_key_expr(["x", "y"], bits=12))).collect()
    for r in rows:
        assert r["z"] == morton([r["x"], r["y"]], 12), (r["x"], r["y"])


def test_zordered_layout_tightens_file_stats(spark, tmp_path):
    # the mechanism z-ordering buys: every file covers a tight
    # hyper-rectangle in BOTH clustered columns, while a linear sort
    # leaves the non-leading column spanning the full range per file
    from pyspark.sql import functions as F

    from yardstick_spark.sources.write import write_sorted, write_zordered

    li = (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
          .select("l_partkey", "l_suppkey", "l_quantity"))
    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, zp, ["l_partkey", "l_suppkey"], target_files=16)
    write_sorted(li, lp, ["l_partkey"], target_files=16)

    def file_ranges(path):
        return (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.min("l_suppkey").alias("y0"),
                 F.max("l_suppkey").alias("y1"))
            .collect()
        )

    # the win is pruning on the NON-leading column: a narrow
    # l_suppkey predicate intersects EVERY file of the l_partkey-
    # sorted layout (each spans the full suppkey range) but only the
    # z-cells whose y-quadrant matches
    lo, hi = 40, 45
    z_files = file_ranges(zp)
    l_files = file_ranges(lp)
    z_hit = sum(1 for r in z_files if r["y0"] <= hi and r["y1"] >= lo)
    l_hit = sum(1 for r in l_files if r["y0"] <= hi and r["y1"] >= lo)
    assert l_hit == len(l_files)          # linear: zero y-skipping
    assert z_hit * 2 <= len(z_files), (z_hit, len(z_files))
    # and the data survives the round trip
    assert (spark.read.parquet(zp).count()
            == spark.read.parquet(lp).count() == li.count())


def test_scd2_ingest_stream_equals_batch(spark, tmp_path):
    # streaming SCD2 maintenance must land on the same dimension state
    # as applying the batches sequentially with the batch operator
    from yardstick_spark.operators import cdc_compact, scd2_merge
    from yardstick_spark.streaming import (
        load_scd2_dim, save_scd2_dim, start_scd2_ingest,
    )

    dim0 = spark.createDataFrame(
        [(1, "NY", "2020-01-01", None, True),
         (2, "SF", "2020-01-01", None, True)],
        "k LONG, city STRING, valid_from STRING, valid_to STRING, "
        "is_current BOOLEAN")
    dim_path = str(tmp_path / "dim")
    save_scd2_dim(dim0, dim_path)

    # two micro-batches arrive as two parquet files
    inc = str(tmp_path / "inc")
    b1 = spark.createDataFrame(
        [(1, "CHI", "2021-01-01"), (3, "DC", "2021-01-01")],
        "k LONG, city STRING, ts STRING")
    b2 = spark.createDataFrame(
        [(1, "BOS", "2022-01-01"), (1, "BOS", "2021-12-01"),  # dup key
         (2, "SF", "2022-01-01")],                            # no-op
        "k LONG, city STRING, ts STRING")
    b1.coalesce(1).write.parquet(f"{inc}/f1")
    schema = spark.read.parquet(f"{inc}/f1").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{inc}/f*"))
    b2.coalesce(1).write.parquet(f"{inc}/f2")
    q = start_scd2_ingest(
        stream, spark, dim_path, ["k"], ["city"], "ts",
        checkpointLocation=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in load_scd2_dim(spark, dim_path).collect())
    # batch twin applied in the same (file) order
    expect_dim = dim0
    for b in (b1, b2):
        expect_dim = scd2_merge(expect_dim, cdc_compact(b, ["k"], "ts"),
                                ["k"], ["city"], "ts")
    expect = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in expect_dim.collect())
    assert got == expect
    # the final state: 1 went NY -> CHI -> BOS with contiguous history
    k1 = [(r[1], r[2], r[3]) for r in got if r[0] == 1]
    assert ("BOS", "2022-01-01", None) in k1
    assert ("CHI", "2021-01-01", "2022-01-01") in k1
    assert ("NY", "2020-01-01", "2021-01-01") in k1


def test_streaming_incremental_agg_matches_batch(spark, tmp_path):
    # the streamed materialized view converges to exactly the batch
    # groupBy over everything ingested, including weighted retractions
    from pyspark.sql import functions as F

    from yardstick_spark.streaming import (
        load_agg_state, save_agg_state, start_incremental_agg,
    )

    seed = spark.createDataFrame(
        [("a", 10.0, 2)], "g STRING, v DOUBLE, cnt LONG")
    path = str(tmp_path / "aggstate")
    save_agg_state(seed, path)

    inc = str(tmp_path / "inc")
    b1 = spark.createDataFrame(
        [("a", 1.0, 1), ("b", 5.0, 1), ("b", 7.0, 1)],
        "g STRING, v DOUBLE, w INT")
    b2 = spark.createDataFrame(
        [("b", 5.0, -1), ("c", 9.0, 1)],  # retract one b row, new c
        "g STRING, v DOUBLE, w INT")
    b1.coalesce(1).write.parquet(f"{inc}/f1")
    schema = spark.read.parquet(f"{inc}/f1").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{inc}/f*"))
    b2.coalesce(1).write.parquet(f"{inc}/f2")
    q = start_incremental_agg(
        stream, spark, path, ["g"], ["v"], weight_col="w",
        checkpointLocation=str(tmp_path / "ckpt_agg"))
    q.processAllAvailable()
    q.stop()
    got = {r.g: (r.v, r.cnt)
           for r in load_agg_state(spark, path).collect()}
    # batch twin: seed + all rows weighted
    allrows = b1.unionAll(b2)
    want_delta = (allrows.groupBy("g")
                  .agg(F.sum(F.col("v") * F.col("w")).alias("v"),
                       F.sum("w").alias("cnt")))
    want = {r.g: (r.v, r.cnt) for r in want_delta.collect()}
    want["a"] = (want["a"][0] + 10.0, want["a"][1] + 2)
    assert got == want
    assert got["b"] == (7.0, 1)   # the retraction landed
    assert got["c"] == (9.0, 1)


def test_streaming_heavy_hitters_bounds_and_exactness(spark, tmp_path):
    # skewed stream: every term's true count must lie in
    # [wlow, wlow + err]; with capacity >= distinct terms the summary
    # is exact (err 0) and equals the batch groupBy
    from pyspark.sql import functions as F

    from yardstick_spark.streaming import (
        load_heavy_hitters, start_heavy_hitters_stream,
    )

    inc = str(tmp_path / "terms")
    b1 = spark.range(0, 3000, 1, 4).selectExpr(
        "concat('t', cast(cast(3000 / (id + 1) as int) as string)) "
        "AS term")
    b2 = spark.range(0, 2000, 1, 4).selectExpr(
        "concat('t', cast(cast(2000 / (id + 1) as int) as string)) "
        "AS term")
    b1.write.parquet(f"{inc}/f1")
    schema = spark.read.parquet(f"{inc}/f1").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{inc}/f*"))
    b2.write.parquet(f"{inc}/f2")

    path = str(tmp_path / "hh")
    q = start_heavy_hitters_stream(
        stream, spark, path, capacity=64,
        checkpointLocation=str(tmp_path / "ckpt_hh"))
    q.processAllAvailable()
    q.stop()
    top = load_heavy_hitters(spark, path, k=10).collect()
    err = {r.err for r in top}
    assert len(err) == 1
    err = err.pop()
    true = {r.term: r.n for r in
            b1.unionAll(b2).groupBy("term")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in top:
        assert r.wlow <= true[r.term] <= r.wlow + err
    # the heaviest terms are unmissable: anything with count > err
    # must be in the summary
    raw = load_heavy_hitters(spark, path, k=None).collect()
    present = {r.term for r in raw if r.term is not None}
    for t, n in true.items():
        if n > err:
            assert t in present, (t, n, err)

    # exact regime: capacity above distinct-term count -> err 0 and
    # counts equal the batch groupBy
    path2 = str(tmp_path / "hh_exact")
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{inc}/f*"))
    q2 = start_heavy_hitters_stream(
        stream2, spark, path2, capacity=5000,
        checkpointLocation=str(tmp_path / "ckpt_hh2"))
    q2.processAllAvailable()
    q2.stop()
    got = {r.term: (r.wlow, r.err)
           for r in load_heavy_hitters(spark, path2, k=5).collect()}
    for t, (w, e) in got.items():
        assert e == 0 and w == true[t]


def test_covariance_stream_equals_batch(spark, tmp_path):
    # streamed moment maintenance must reconstruct exactly the batch
    # covariance of the union of all micro-batches
    import numpy as np

    from yardstick_spark.llm import covariance_matrix
    from yardstick_spark.streaming import (
        covariance_from_moments, latest_moments, start_covariance_stream,
    )

    rng = np.random.RandomState(13)
    X = rng.randn(90, 5).astype(np.float32)
    parts = [X[:30], X[30:55], X[55:]]

    inc = str(tmp_path / "vecs")
    frames = []
    for bi, chunk in enumerate(parts):
        df = spark.createDataFrame(
            [(bi * 1000 + i, [float(x) for x in r])
             for i, r in enumerate(chunk)],
            "vec_id long, embedding array<float>")
        frames.append(df)
        df.coalesce(1).write.parquet(f"{inc}/f{bi}")
    schema = spark.read.parquet(f"{inc}/f0").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{inc}/f*"))
    state = str(tmp_path / "moments")
    q = start_covariance_stream(
        stream, spark, state,
        checkpointLocation=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    got = {(r.i, r.j): r.cov for r in covariance_from_moments(
        latest_moments(spark, state), round_to=None).collect()}
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    want = {(r.i, r.j): r.cov
            for r in covariance_matrix(union, round_to=None).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)

    # replay idempotence: foreachBatch is at-least-once — re-running
    # the LAST micro-batch must leave the state unchanged (each batch
    # recomputes its own version from the predecessor)
    from yardstick_spark.streaming.stats import (_batch_moments,
                                                 merge_moment_tables)
    last = spark.read.parquet(f"{inc}/f2")
    prev = latest_moments(spark, state, below=2)
    replay = merge_moment_tables(prev, _batch_moments(last, "embedding"))
    replay.write.mode("overwrite").parquet(f"{state}/v=2")
    again = {(r.i, r.j): r.cov for r in covariance_from_moments(
        latest_moments(spark, state), round_to=None).collect()}
    for k in want:
        assert again[k] == pytest.approx(want[k], abs=1e-9)


def test_compact_files_reduces_count_keeps_rows(spark, tmp_path):
    from yardstick_spark.sources import compact_files

    path = str(tmp_path / "frag")
    df = spark.range(10_000).selectExpr("id", "id % 97 AS k")
    df.repartition(40).write.parquet(path)  # fragmented: 40 files
    before = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    stats = compact_files(spark, path, target_file_mb=512)
    assert stats["files_before"] >= 40
    assert stats["files_out"] == 1
    after = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    assert before == after
    import glob
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    assert not glob.glob(str(tmp_path / "frag__compact_*"))


def test_compact_files_refuses_leftover_backup(spark, tmp_path):
    # a crashed swap parks the data at <path>__compact_old; a second
    # run must refuse with recovery instructions, never silently
    # delete the parked copy (round-6 ADVICE fix, sources/write.py)
    from yardstick_spark.sources import compact_files

    path = str(tmp_path / "frag0")
    spark.range(100).write.parquet(path)
    (tmp_path / "frag0__compact_old").mkdir()
    with pytest.raises(RuntimeError, match="compact_old"):
        compact_files(spark, path)
    # the parked dir is untouched
    assert (tmp_path / "frag0__compact_old").exists()


def test_compact_files_with_sort_restores_clustering(spark, tmp_path):
    from yardstick_spark.sources import compact_files

    path = str(tmp_path / "frag2")
    spark.range(20_000).selectExpr(
        "pmod(id * 2654435761, 20000) AS ts", "id AS v"
    ).repartition(30).write.parquet(path)
    stats = compact_files(spark, path, sort_cols=["ts"], target_files=4)
    # with sort the output files cover DISJOINT ts ranges (the
    # pruning property)
    import glob

    import pyarrow.parquet as pq
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) >= 2 or stats["files_out"] == 1
    spans = []
    for f in files:
        vals = pq.read_table(f, columns=["ts"]).column("ts").to_pylist()
        if vals:
            spans.append((min(vals), max(vals)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint ranges


def test_line_dedup_ingest_stream_equals_batch(spark, tmp_path):
    # each micro-batch cleaned via foreachBatch must equal the batch
    # operator run on the same rows against the same store
    from yardstick_spark.llm import (
        remove_duplicate_lines_incremental, save_line_frequencies,
    )
    from yardstick_spark.streaming import start_line_dedup_ingest

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus = docs.filter("doc_id % 5 <> 0")
    store = str(tmp_path / "lfstore")
    save_line_frequencies(corpus, store)

    new_dir = str(tmp_path / "incoming_lines")
    batch_docs = docs.filter("doc_id % 5 = 0").select("doc_id", "text")
    batch_docs.write.parquet(new_dir)
    schema = spark.read.parquet(new_dir).schema
    stream = spark.readStream.schema(schema).parquet(new_dir)

    got = []
    q = start_line_dedup_ingest(
        stream, spark, store,
        sink=lambda df, bid: got.extend(map(tuple, df.collect())),
        checkpointLocation=str(tmp_path / "ckpt_lines"),
    )
    q.processAllAvailable()
    q.stop()
    want = sorted(map(tuple, remove_duplicate_lines_incremental(
        batch_docs, spark, store).collect()))
    assert sorted(got) == want and len(want) == batch_docs.count()


def test_bm25_index_ingest_stream_equals_batch(spark, tmp_path):
    # streaming index maintenance must converge to the same index a
    # full batch rebuild produces: identical top-k scores afterward
    from yardstick_spark.llm import (bm25_scores, bm25_search_index,
                                     save_bm25_index)
    from yardstick_spark.streaming import start_bm25_index_ingest

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    seed = docs.filter("doc_id % 5 <> 0")
    idx = str(tmp_path / "bm25_stream_idx")
    save_bm25_index(seed, idx, buckets=8)

    new_dir = str(tmp_path / "incoming_docs")
    batch_docs = docs.filter("doc_id % 5 = 0").select("doc_id", "text")
    batch_docs.write.parquet(new_dir)
    schema = spark.read.parquet(new_dir).schema
    stream = spark.readStream.schema(schema).parquet(new_dir)

    q = start_bm25_index_ingest(
        stream, spark, idx,
        checkpointLocation=str(tmp_path / "ckpt_bm25"),
    )
    q.processAllAvailable()
    q.stop()

    query = "spark join window query"
    got = [(r.doc_id, r.bm25, r.rank)
           for r in bm25_search_index(spark, idx, query,
                                      top_k=20).collect()]
    want = [(r.doc_id, r.bm25, r.rank)
            for r in bm25_scores(docs, query, top_k=20).collect()]
    from yardstick_spark.llm import clear_dedup_caches
    clear_dedup_caches()
    assert got == want
