"""Relay (consumer-side re-ingest) throughput bench.

Publishes a seed-fixed changefeed to a file topic under each requested
envelope codec, then times ``topic_to_log`` — the consumer-side relay that
reconstructs a replayable log from the topic (decode is ``from_json`` for
the JSON wires and Arrow-batched Python varint walks for the binary wires,
with the batch-level hex→bytes hoist). Prints ONE JSON line::

    {"metric": "relay msgs/sec per protocol", "events": N,
     "protocols": {"avro": {"publish_sec": .., "relay_sec": ..,
                            "relay_msgs_per_sec": ..}, ...}}

Env knobs: RELAY_BENCH_EVENTS (default 1_000_000), RELAY_BENCH_PROTOCOLS
(csv, default all six), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tiflow_spark.generator import FEED_VERSION, generate_changefeed
    from tiflow_spark.session import get_spark
    from tiflow_spark.sinks.mq import (
        MQ_PROTOCOLS, FileMQSink, MQChangefeed, topic_to_log,
    )

    n_events = int(os.environ.get("RELAY_BENCH_EVENTS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    protocols = (
        os.environ.get("RELAY_BENCH_PROTOCOLS", "").split(",")
        if os.environ.get("RELAY_BENCH_PROTOCOLS")
        else sorted(MQ_PROTOCOLS)
    )

    work = f"/tmp/tiflow_relay_bench_{n_events}_v{FEED_VERSION}"
    feed_dir = os.path.join(work, "feed")
    if not os.path.exists(os.path.join(feed_dir, "log")):
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(feed_dir, exist_ok=True)
        generate_changefeed(
            feed_dir, n_convs=max(n_events // 50, 100), turns_per_conv=10,
            n_changes=n_events, seed=42,
            resolved_every=max(n_events // 4, 1000), n_files=max(cpus, 8),
            ddl_plan=[(0.5, {"action": "add_column", "name": "note",
                             "type": "string", "default": ""})],
        )
    log_path = os.path.join(feed_dir, "log")

    # tiny warmup feed: each protocol pays its JVM JIT / codegen-compile /
    # Arrow-init cost on this before its timed leg — otherwise the FIRST
    # protocol in the loop absorbs the whole session warmup (measured ~2×
    # on its relay number and worse on publish)
    warm_feed = os.path.join(work, "warm_feed")
    if not os.path.exists(os.path.join(warm_feed, "log")):
        os.makedirs(warm_feed, exist_ok=True)
        generate_changefeed(
            warm_feed, n_convs=200, turns_per_conv=5, n_changes=20_000,
            seed=7, resolved_every=10_000, n_files=8,
            ddl_plan=[(0.5, {"action": "add_column", "name": "note",
                             "type": "string", "default": ""})],
        )

    spark = get_spark(app="relay_bench", cpus=cpus, shuffle_partitions=cpus)
    out: dict[str, dict] = {}
    for proto in protocols:
        topic_dir = os.path.join(work, f"topic_{proto}")
        relay_dir = os.path.join(work, f"relay_{proto}")
        shutil.rmtree(topic_dir, ignore_errors=True)
        shutil.rmtree(relay_dir, ignore_errors=True)
        for d in (f"{topic_dir}_warm", f"{relay_dir}_warm"):
            shutil.rmtree(d, ignore_errors=True)
        wsink = FileMQSink(f"{topic_dir}_warm", n_partitions=min(cpus, 8))
        MQChangefeed(os.path.join(warm_feed, "log"), wsink,
                     protocol=proto).run(spark)
        topic_to_log(spark, wsink, f"{relay_dir}_warm")
        sink = FileMQSink(topic_dir, n_partitions=cpus)
        t0 = time.time()
        MQChangefeed(log_path, sink, protocol=proto).run(spark)
        publish = time.time() - t0
        n_msgs = sum(sink.topic_state()["offsets"].values())
        t0 = time.time()
        topic_to_log(spark, sink, relay_dir)
        relay = time.time() - t0
        out[proto] = {
            "publish_sec": round(publish, 2),
            "relay_sec": round(relay, 2),
            "relay_msgs_per_sec": round(n_msgs / relay, 1),
            "messages": n_msgs,
        }
        print(f"# {proto}: publish {publish:.1f}s, relay {relay:.1f}s "
              f"({n_msgs / relay:,.0f} msgs/s)", file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "metric": "relay msgs/sec per protocol (consumer-side re-ingest)",
        "events": n_events, "cpus": cpus, "protocols": out,
    }))


if __name__ == "__main__":
    main()
