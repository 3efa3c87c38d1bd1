"""Decision-loop bot — the ``examples/dex_trading_bot.rs`` analog.

The reference bot pre-filters the stream (trades > $10k USD on an
allow-listed DEX program set, ``dex_trading_bot.rs:95-106``), then
dispatches each passing event to an async processor with
fire-and-forget ``tokio::spawn`` (``:138-142``). This analog keeps the
two-step shape — a vectorized ``should_process`` filter, then an
action stage holding position state — but makes the actions
DETERMINISTIC (SURVEY §7: the reference is order-agnostic; we trade
fire-and-forget for replayable epochs):

1. the streaming pipeline commits per-epoch output exactly-once;
2. the bot consumes epochs in commit order, accumulating per-host
   "volume" (chars of retained text = the $-amount analog);
3. each time a host's cumulative volume crosses a tier boundary the
   bot emits one action row (the trade-signal analog).

Replaying the bot over the same committed outputs yields an identical
ledger — proven at the end of this script.

Run from the repo root: ``python examples/actions_bot.py``
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

import pandas as pd

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import FilterBuilder
from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
    ensure_pages_log,
    run_flagship,
)
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

# --- 1. stream to committed epochs (client.start() analog) --------------
data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_bot"
out_dir = f"{data_dir}_out"
ensure_pages_log(data_dir, PagesSpec(num_rows=20000, span_s=1800))
shutil.rmtree(out_dir, ignore_errors=True)
summary = run_flagship(data_dir, out_dir, EngineConfig(min_text_len=1))
print("pipeline committed epochs:", summary["epochs"])

# --- 2. should_process: allow-listed hosts + floor (DexProcessor analog)
# The reference allow-lists 4 program ids and floors at $10k; we
# allow-list the 4 hottest hosts and floor at 64 chars of text.
ALLOWED_HOSTS = [f"host-{i:03d}.example.com" for i in range(4)]
should_process = (
    FilterBuilder()
    .min_text_len(64)              # min $ amount analog
    .hosts(ALLOWED_HOSTS)          # program-id allow-list analog
    .build()
)

# --- 3. the bot: per-epoch action loop with position state --------------
TIERS = [100_000, 300_000, 600_000, 1_000_000]  # cumulative-volume signals


def run_bot(sink: EpochSink) -> pd.DataFrame:
    """Consume committed epochs in order; emit one row per tier cross."""
    position: dict[str, int] = {}          # host -> cumulative volume
    actions = []
    for epoch in sink.committed_epochs():
        tbl = sink.read_output("pages", epochs=[epoch])
        if tbl.num_rows == 0:
            continue
        tbl = should_process.apply(tbl)
        vol = (
            tbl.group_by("host")
            .aggregate([("text_len", "sum")])
            .to_pandas()
            .sort_values("host")
        )
        for host, add in zip(vol["host"], vol["text_len_sum"]):
            before = position.get(host, 0)
            after = before + int(add)
            position[host] = after
            for tier in TIERS:
                if before < tier <= after:
                    actions.append((epoch, host, tier, after))
    return pd.DataFrame(
        actions, columns=["epoch", "host", "tier", "cumulative_volume"])


sink = EpochSink(out_dir)
ledger = run_bot(sink)
print(f"\naction ledger ({len(ledger)} signals):")
print(ledger.to_string(index=False))

# --- 4. replay determinism (vs the reference's fire-and-forget) ---------
replay = run_bot(sink)
assert replay.equals(ledger), "bot replay diverged from first run"
print("\nreplay over the same committed epochs: identical ledger ✓")

ray.shutdown()
sys.exit(0)
