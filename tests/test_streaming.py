"""Event-time windows: batch forms + a genuine Structured Streaming run
(file source → watermark → windowed agg → memory sink, availableNow)."""

import shutil

from csvplus_spark import load_table
from csvplus_spark.streaming.events import (
    session_agg,
    sliding_agg,
    stream_tumbling_counts,
    tumbling_agg,
)


def test_tumbling_counts_sum_to_total(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").df
    agg = tumbling_agg(ev, "1 hour").collect()
    assert sum(r["n_events"] for r in agg) == ev.count()


def test_sliding_double_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").df
    agg = sliding_agg(ev, 3600, 1800).collect()
    # every event falls in exactly window/slide = 2 windows
    assert sum(r["n_events"] for r in agg) == 2 * ev.count()


def test_session_windows_partition_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").df
    agg = session_agg(ev, "10 minutes").collect()
    assert sum(r["n_events"] for r in agg) == ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert len(agg) >= n_users


def test_structured_streaming_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = stream_tumbling_counts(spark, str(src), "1 hour", "1 hour")
    q = (
        stream.writeStream.format("memory").queryName("tumbling_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = tumbling_agg(load_table(spark, sf_dir, "events").df, "1 hour").collect()
    expect = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch}
    assert got == expect


def test_streaming_sliding_matches_batch(spark, sf_dir, tmp_path):
    from csvplus_spark.streaming.events import stream_sliding_counts

    src = tmp_path / "ev_slide"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = stream_sliding_counts(spark, str(src), 3600, 1800, "1 hour")
    q = (
        stream.writeStream.format("memory").queryName("sliding_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["window_start"]: r["n_events"]
           for r in spark.sql("SELECT * FROM sliding_test").collect()}
    batch = sliding_agg(load_table(spark, sf_dir, "events").df, 3600, 1800)
    expect = {r["window_start"]: r["n_events"] for r in batch.collect()}
    assert got == expect


def test_streaming_session_windows_append(spark, sf_dir, tmp_path):
    import shutil

    from csvplus_spark.streaming.events import (
        stream_session_counts,
        write_stream_parquet,
    )

    src = tmp_path / "ev_sess"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = stream_session_counts(spark, str(src), "10 minutes", "0 seconds")
    q = write_stream_parquet(stream, str(tmp_path / "out"),
                             str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    batch = session_agg(load_table(spark, sf_dir, "events").df, "10 minutes")
    # append mode only emits sessions closed by the watermark; with the
    # finite input all sessions except those near max(ts) are closed
    assert out.count() > 0
    got = {(r["session_start"], r["user_id"]): r["n_events"] for r in out.collect()}
    expect = {(r["session_start"], r["user_id"]): r["n_events"] for r in batch.collect()}
    for k, v in got.items():
        assert expect[k] == v  # every emitted session matches batch truth
