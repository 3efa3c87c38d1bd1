"""Operational CLI — the analog of the reference's cargo binaries
(``src/main.rs`` + ``examples/*.rs`` entry points) for this engine:

    python -m bitquery_kafka_streams_rust_ray run INPUT OUT [--fresh] [--no-drain]
    python -m bitquery_kafka_streams_rust_ray show OUT
    python -m bitquery_kafka_streams_rust_ray savepoint OUT SAVEPOINT [--epoch E]
    python -m bitquery_kafka_streams_rust_ray fork SAVEPOINT NEW_OUT
    python -m bitquery_kafka_streams_rust_ray compact OUT [--target-bytes N]
    python -m bitquery_kafka_streams_rust_ray gen-pages DIR [--rows N] [--seed S]

Engine knobs come from ``GRAFT_CFG_*`` environment variables
(``EngineConfig.from_env`` — e.g. ``GRAFT_CFG_STATE_SHARDS=8``,
``GRAFT_CFG_UPDATE_MODE=1 GRAFT_CFG_UPDATE_HORIZON_S=120``,
``GRAFT_CFG_FUNNEL_EMIT_TIMEOUTS=true``), matching the reference's
env-driven production config (``config/production.env``). Only ``run``
starts a Ray session (local mode; ``RAY_GRAFT_CPUS`` caps it);
``show``/``savepoint``/``fork``/``compact`` are manifest-level
operations that never touch Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cfg():
    from .config import EngineConfig

    return EngineConfig.from_env()


def cmd_run(args) -> int:
    import ray

    if not ray.is_initialized():
        kwargs = {}
        cpus = os.environ.get("RAY_GRAFT_CPUS")
        if cpus:
            kwargs["num_cpus"] = int(cpus)
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kwargs)
    try:
        from .pipelines.flagship import run_flagship

        summary = run_flagship(args.input_dir, args.out_dir, config=_cfg(),
                               resume=not args.fresh, drain=args.drain)
        print(json.dumps({
            "epochs": summary.get("epochs"),
            "watermark_us": summary.get("watermark_us"),
            "counters": summary["metrics"]["counters"],
            "gauges": summary["metrics"]["gauges"],
        }, sort_keys=True, default=str))
        return 0
    finally:
        ray.shutdown()


def cmd_show(args) -> int:
    from .sinks.exactly_once import EpochSink

    sink = EpochSink(args.out_dir)
    epochs = sink.committed_epochs()
    if not epochs:
        print(json.dumps({"out_dir": args.out_dir, "epochs": []}))
        return 0
    last = sink.read_manifest(epochs[-1])
    # manifests carry per-epoch counter DELTAS and per-epoch output
    # inventories; the run view is their sum
    counters: dict[str, float] = {}
    outputs: dict[str, int] = {}
    for e in epochs:
        m = last if e == epochs[-1] else sink.read_manifest(e)
        for k, v in m.get("counters", {}).items():
            counters[k] = counters.get(k, 0) + v
        for name, entry in m.get("outputs", {}).items():
            if name.endswith(".parquet"):
                base = name.split("-")[0].removesuffix(".parquet")
                outputs[base] = outputs.get(base, 0) + int(
                    entry.get("rows", 0))
    out = {
        "out_dir": args.out_dir,
        "epochs": epochs,
        "watermark_us": last.get("watermark_us"),
        "drained": bool(last.get("drain")),
        "counters": counters,
        "config_fp": last.get("config_fp"),
        "outputs": outputs,
    }
    if last.get("savepoint"):
        out["savepoint"] = last["savepoint"]
    print(json.dumps(out, sort_keys=True))
    return 0


def cmd_savepoint(args) -> int:
    from .state.savepoint import export_savepoint

    man = export_savepoint(args.out_dir, args.savepoint_dir,
                           epoch=args.epoch)
    print(json.dumps(man, sort_keys=True))
    return 0


def cmd_fork(args) -> int:
    from .state.savepoint import fork_from_savepoint

    man = fork_from_savepoint(args.savepoint_dir, args.new_out_dir)
    print(json.dumps({"epoch": man["epoch"],
                      "watermark_us": man["watermark_us"],
                      "out_dir": args.new_out_dir}, sort_keys=True))
    return 0


def cmd_compact(args) -> int:
    from .sinks.compaction import compact_all
    from .sinks.exactly_once import EpochSink

    sink = EpochSink(args.out_dir)
    sink.acquire_lock()
    try:
        results = compact_all(sink, args.target_bytes)
    finally:
        sink.release_lock()
    print(json.dumps(
        {name: (m["generation"] if m else None)
         for name, m in sorted(results.items())}, sort_keys=True))
    return 0


def cmd_gen_pages(args) -> int:
    from .sources.pages import (PagesSpec, generate_host_metadata,
                                generate_pages)

    spec = PagesSpec(num_rows=args.rows, seed=args.seed)
    man = generate_pages(args.dir, spec)
    generate_host_metadata(args.dir, spec)
    print(json.dumps({"dir": args.dir, "rows": args.rows,
                      "files": man.get("files")}, sort_keys=True,
                     default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m bitquery_kafka_streams_rust_ray",
                                description=__doc__.split("\n\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run the streaming pages pipeline")
    r.add_argument("input_dir")
    r.add_argument("out_dir")
    r.add_argument("--fresh", action="store_true",
                   help="ignore committed epochs (resume is the default)")
    r.add_argument("--no-drain", dest="drain", action="store_false")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("show", help="committed epochs / watermark / counters")
    s.add_argument("out_dir")
    s.set_defaults(fn=cmd_show)

    sp = sub.add_parser("savepoint", help="export a committed checkpoint")
    sp.add_argument("out_dir")
    sp.add_argument("savepoint_dir")
    sp.add_argument("--epoch", type=int, default=None)
    sp.set_defaults(fn=cmd_savepoint)

    f = sub.add_parser("fork", help="bootstrap a new out_dir from a savepoint")
    f.add_argument("savepoint_dir")
    f.add_argument("new_out_dir")
    f.set_defaults(fn=cmd_fork)

    c = sub.add_parser("compact", help="merge per-epoch files into bounded bins")
    c.add_argument("out_dir")
    c.add_argument("--target-bytes", type=int, default=64 * 1024 * 1024)
    c.set_defaults(fn=cmd_compact)

    g = sub.add_parser("gen-pages", help="deterministic synthetic pages log")
    g.add_argument("dir")
    g.add_argument("--rows", type=int, default=10_000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen_pages)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except (ValueError, RuntimeError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
