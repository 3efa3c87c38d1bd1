"""Engine configuration.

Ports the *semantics* of the reference's ``SdkConfig`` /
``ProcessingConfig`` defaults (reference ``src/config.rs:262-275,
317-328``) onto Ray Data execution knobs. Values that the reference
spends code enforcing by hand (queue caps, backpressure thresholds,
memory models) are provided for free by Ray Data's streaming executor;
what remains configurable here is what actually shapes a Ray pipeline:
batch sizes, actor-pool sizes, window/dedup parameters, lateness, and
sink layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class WindowConfig:
    """Event-time window parameters (seconds of ``warc_ts`` time)."""

    tumbling_size_s: int = 60        # reference per-minute stats (examples/dex_monitor.rs:42)
    sliding_size_s: int = 120
    sliding_slide_s: int = 60
    session_gap_s: int = 180

    def __post_init__(self) -> None:
        if self.sliding_size_s % self.sliding_slide_s != 0:
            raise ValueError(
                "sliding_size_s must be a multiple of sliding_slide_s "
                f"(got {self.sliding_size_s}/{self.sliding_slide_s})"
            )


@dataclass(frozen=True)
class FunnelConfig:
    """Streaming CEP funnel over the page stream (stages/cep.py
    semantics hosted in ``state.store.FunnelState``).

    Pages are classified into ordered size stages by ``text_len``
    (small / medium / large via ``bounds``); a host matches when it
    serves the full escalation within ``within_s`` of event time —
    the per-key ordered-sequence pattern the reference's CEP loop
    reacts to, keyed like the session windows.
    """

    enabled: bool = True
    within_s: int = 600
    bounds: tuple[int, int] = (250, 450)  # text_len stage boundaries
    # negation (Flink CEP notFollowedBy): pages with text_len >=
    # veto_min_len are VETO events — one folding strictly after a
    # chain's start while it is incomplete kills that key's match.
    # Must exceed bounds[-1] (veto events sit above the last stage).
    veto_min_len: int | None = None
    # timed-out partial matches: emit (host, start_ts, timeout_ts,
    # reached_stage) rows into a funnel_timeouts output when a started
    # chain can no longer complete within the bound — the
    # abandoned-funnel analytics row (Flink TimedOutPartialMatchHandler)
    emit_timeouts: bool = False

    @property
    def n_stages(self) -> int:
        return len(self.bounds) + 1

    @property
    def stage_bounds(self) -> tuple[int, ...]:
        """searchsorted boundaries including the veto class (stage index
        ``n_stages`` when ``veto_min_len`` is set)."""
        return (self.bounds + (self.veto_min_len,)
                if self.veto_min_len is not None else self.bounds)

    @property
    def veto_stage(self) -> int | None:
        return self.n_stages if self.veto_min_len is not None else None

    def validate(self) -> None:
        if (self.veto_min_len is not None
                and self.veto_min_len <= self.bounds[-1]):
            raise ValueError(
                "funnel veto_min_len must exceed the last stage bound "
                f"(got {self.veto_min_len} <= {self.bounds[-1]})")


@dataclass(frozen=True)
class EngineConfig:
    """Top-level configuration for the streaming engine.

    Mirrors the reference defaults where a direct analog exists:

    - ``dedup_window_s=300``  <- reference ``dedup_window`` (src/config.rs:270)
    - ``batch_size=1024``     <- reference batches 100-1000 events
      (src/config.rs:268, config/production.env:22); ours is larger
      because Arrow batches are columnar and cheap
    - ``state_shards``        <- analog of `parallel_workers = num_cpus`
      (src/config.rs:266), the number of keyed state actors
    """

    # --- event-time semantics ---
    dedup_window_s: int = 300
    dedup_spill_dir: str | None = None  # directory for sqlite-backed
    # per-shard dedup state (state/store.py::SpillDedupState) — the
    # 10^12-url path where per-shard last-seen maps exceed actor RAM.
    # None = in-memory dict (default); ":memory:" exercises the sqlite
    # code path without touching disk. Semantics, snapshots and resume
    # are identical either way (property-pinned).
    allowed_lateness_s: int = 120
    windows: WindowConfig = field(default_factory=WindowConfig)
    funnel: FunnelConfig = field(default_factory=FunnelConfig)
    topk_hosts: int = 10             # running top-k hosts by cumulative doc
    # count, re-emitted exactly every epoch (0 disables). Exact: hosts
    # are owner-partitioned across state shards, so the global top-k is
    # the k-merge of per-shard top-k candidates. For unbounded key
    # domains cap per-shard memory with ``topk_max_keys``.
    topk_max_keys: int = 0           # 0 = exact counts (memory O(distinct
    # keys per shard)); >0 = Misra-Gries shrink to this many counters
    # per shard (counts become lower bounds with error <= total/(cap+1))
    sketch_distinct: bool = False    # per-(lang, tumbling-window) distinct
    # hosts via mergeable HLL registers — the documented 100-TB stand-in
    # for exact per-window distinct. When on, tumbling_lang gains BOTH
    # columns (exact `distinct_hosts` companion + `approx_hosts`) and a
    # sketch_distinct_rel_err lineage metric; default off keeps output
    # byte-identical
    sketch_distinct_p: int = 12      # HLL precision: 2**p registers per
    # (key, window) partial = 4 KiB at 12 (std err ~1.6%)

    # --- physical execution ---
    batch_size: int = 1024           # rows per Arrow batch in stateful stages
    read_batch_size: int = 256       # smaller for wide `html` binary rows
    state_shards: int = 8            # keyed state actors (dedup/window/join)
    extract_concurrency: int = 8     # actor pool max size for html->text
    join_concurrency: int = 4        # actor pool max size for the as-of join
    files_per_epoch: int = 2         # micro-batch granularity of the driver loop
    read_num_blocks: int | None = None  # override read block count (None =
    # Ray's bytes-aware planning; set to ~2x cores when inputs are many
    # tiny files, which otherwise yield sub-1k-row blocks and per-task
    # scheduling overhead dominates)
    overlap_commit: bool = True      # overlap epoch e-1's commit tail
    # (finalize-merge, close, snapshot, 2PC manifest) with epoch e's
    # exchange: the exchange streams on a worker thread while the driver
    # settles the previous epoch. Safe because exchange pushes only
    # touch per-epoch buffers (excluded from snapshots) and finalize(e)
    # is submitted only after complete(e-1) returned; commits stay
    # strictly ordered on the driver thread. Off = fully serial tail
    # (the pre-round-4 schedule), for debugging/bisection.
    fsync_output: bool = False       # fsync each staged shard file before the
    # manifest commit. Exactly-once vs process crashes holds either way
    # (uncommitted epochs replay); enable for machine-crash durability at
    # the cost of serialized disk flushes

    # --- resilience (reference src/config.rs:356-366 retry defaults) ---
    exchange_ack_timeout_s: float = 120.0  # exchange barrier deadline:
    # async shard pushes must all be buffered (received == pushed per
    # shard) within this window after the exchange dataset completes,
    # else the epoch fails into the replay path
    exchange_stall_grace_s: float = 30.0  # earlier cutoff: if the
    # received counts make NO progress for this long the pushes are
    # presumed lost (owning worker died before the shard fetched the
    # args) and the epoch replays without burning the full timeout.
    # Note the poll itself queues behind in-flight shard work, so a
    # busy actor doesn't tick this clock — only genuine silence does
    epoch_replay_budget: int = 2     # replays of one epoch's exchange phase
    # before the run fails (reference max_retries analog); each replay
    # backs off exponentially with deterministic jitter
    sink_breaker_threshold: int = 3  # consecutive failed sink commits that
    sink_breaker_reset_s: float = 30.0  # open the sink circuit / its reset
    lock_lease_s: float = 3600.0     # run-lock lease: a lock whose mtime is
    # older than this is stealable by a contender. Heartbeats fire on
    # every epoch commit, so size it above the longest expected epoch —
    # deployments with >1h epochs raise it here instead of silently
    # becoming steal-able mid-run

    # --- observability ---
    collect_dataset_stats: bool = False  # persist Ray Dataset.stats()
    # for each epoch's exchange under _observability/epoch=N/ — the
    # per-operator wall-time/throughput breakdown used to verify a
    # stage's time is useful compute, at the cost of a small driver-side
    # string per epoch
    http_port: int | None = None     # serve /health /ready /live /metrics
    # /version on 127.0.0.1:<port> for the duration of run() (0 =
    # ephemeral port; http_server.rs:41-87 analog). None = no listener.

    quarantine_late: bool = False    # also surface LATE rows in the
    # committed quarantine table (reason="late") for offline
    # reprocessing; off by default — late rows stay a counter
    # (late_dropped) and the quarantine carries parse errors only

    # --- allowed-lateness UPDATE mode (Flink-style window revisions) ---
    update_mode: bool = False        # accept rows behind the frozen
    # watermark but within update_horizon_s: they flow the normal row
    # path (pages output, dedup, tumbling/sliding/session partials) and
    # when their window has ALREADY been emitted, the next epoch commits
    # a correction row in the window_updates output with a bumped
    # revision (consumers take max revision per (kind, key, start)).
    # Off by default — every existing output stays byte-identical.
    # Order-sensitive state is exempt by construction: funnel (CEP) and
    # distinct-sketch partials ignore accepted-late rows (their fold
    # order is the correctness invariant), documented in streaming.py.
    update_horizon_s: int = 600      # how far behind the watermark a row
    # may be and still be accepted as a correction; beyond it rows are
    # LATE (counter / quarantine) exactly as without update mode

    # --- per-partition watermarks (Kafka/Flink min-combine) ---
    per_partition_watermark: bool = False  # track one watermark per
    # input partition (key-shard file stream) and take the MINIMUM
    # across partitions: a lagging or idle partition holds the global
    # watermark back instead of having its rows declared late by faster
    # partitions' progress. Partition maxes come from parquet FOOTER
    # statistics at plan time (a driver-side metastore scan, no extra
    # data pass), so the watermark schedule stays a pure function of
    # the epoch composition. Off by default: the global tracker folds
    # the row-derived epoch max exactly as before (byte-identical).
    watermark_idle_epochs: int = 0  # with per_partition_watermark: a
    # partition contributing no data for this many CONSECUTIVE epochs
    # is excluded from the min-combine until it produces again — the
    # deterministic (epoch-counted, never wall-clock) analog of Flink's
    # withIdleness, so one dead key-shard stream cannot pin the global
    # watermark and grow keyed state forever. 0 = off (every partition
    # always combines). Reappearing partitions' stale rows are late by
    # construction and ride the existing late counters / quarantine.

    # --- early firing (Flink-style speculative window previews) ---
    early_fire: bool = False         # emit the current partial result of
    # every still-OPEN tumbling/sliding window at each epoch commit into
    # a window_early output tagged with the emitting epoch. Previews are
    # monotone (counts only grow epoch over epoch) and are superseded by
    # the final on-time emission in tumbling/sliding_lang (and by any
    # update-mode correction after that). Pure view over existing state:
    # nothing new is checkpointed, off by default, composable with
    # update_mode — together they give the full trigger triple
    # (early speculation / on-time final / late correction).

    interval_join_s: int = 0         # streaming dual-buffer interval
    # self-join: emit every pair of surviving pages from the same host
    # whose event times lie within this bound (co-crawl burst pairs)
    # into a copage_pairs output. 0 = off. State is a per-host buffer
    # with watermark eviction (ts + bound < watermark); a pair emits
    # exactly once, when its later-arriving row folds in — the stateful
    # streaming form of the batch interval join (stages/join.py).
    # Order-sensitive: accepted-late correction rows are excluded, like
    # the funnel. Fingerprinted only when on.

    # --- filter defaults (F4 analog: weight x text_len >= threshold) ---
    min_text_len: int = 0
    min_weighted_len: float = 0.0

    # --- post-drain maintenance ---
    compact_after_drain: bool = False  # after the drain commit, merge
    # each output's per-epoch/per-shard files into ~compact_target_bytes
    # files under <out>/compacted/ (own 2PC manifest; readers prefer
    # compacted generations). Opt-in: leaves per-epoch layout untouched
    # by default.
    compact_target_bytes: int = 128 << 20
    state_snapshot_retention: int = 0  # keep per-shard state
    # checkpoint files (state-*.pkl + dedup sqlite sidecars) only for
    # the last N committed epochs, pruning older ones right after each
    # commit. Resume restores from the LAST committed epoch only, so
    # older snapshots are pure storage cost (epochs x state size — the
    # dedup B-trees dwarf the data at web scale). 0 = keep all
    # (byte-identical to prior behavior); N >= 1 keeps resume safe by
    # construction and still tolerates N-1 manually dropped manifests.

    def validate(self) -> None:
        """Fail fast on nonsense values (reference src/config.rs:43-49)."""
        if self.dedup_window_s <= 0:
            raise ValueError("dedup_window_s must be positive")
        if self.allowed_lateness_s < 0:
            raise ValueError("allowed_lateness_s must be >= 0")
        if self.batch_size <= 0 or self.read_batch_size <= 0:
            raise ValueError("batch sizes must be positive")
        if self.state_shards <= 0:
            raise ValueError("state_shards must be positive")
        if self.files_per_epoch <= 0:
            raise ValueError("files_per_epoch must be positive")
        if self.epoch_replay_budget < 0:
            raise ValueError("epoch_replay_budget must be >= 0")
        if self.interval_join_s < 0:
            raise ValueError("interval_join_s must be >= 0")
        self.funnel.validate()
        if self.sink_breaker_threshold <= 0:
            raise ValueError("sink_breaker_threshold must be positive")
        if self.topk_hosts < 0 or self.topk_max_keys < 0:
            raise ValueError("topk_hosts / topk_max_keys must be >= 0")
        if self.compact_target_bytes <= 0:
            raise ValueError("compact_target_bytes must be positive")
        if self.state_snapshot_retention < 0:
            raise ValueError("state_snapshot_retention must be >= 0 "
                             "(0 keeps every epoch's snapshot)")
        if self.watermark_idle_epochs < 0:
            raise ValueError("watermark_idle_epochs must be >= 0 "
                             "(0 disables idleness exclusion)")
        if not 4 <= self.sketch_distinct_p <= 18:
            raise ValueError("sketch_distinct_p must be in [4, 18] "
                             "(16 B to 256 KiB registers per window)")
        if self.lock_lease_s <= 0:
            raise ValueError("lock_lease_s must be positive")
        if self.exchange_ack_timeout_s <= 0:
            raise ValueError("exchange_ack_timeout_s must be positive")
        if self.exchange_stall_grace_s <= 0:
            raise ValueError("exchange_stall_grace_s must be positive")
        if self.update_mode:
            if self.update_horizon_s <= 0:
                raise ValueError("update_mode needs update_horizon_s > 0")
            if self.update_horizon_s > self.dedup_window_s:
                # a correction whose duplicate twin was already evicted
                # from the dedup store would double-write its page row
                raise ValueError(
                    "update_horizon_s must be <= dedup_window_s so "
                    "accepted-late rows still dedup against their twins")

    @classmethod
    def from_env(cls, env: dict | None = None,
                 prefix: str = "GRAFT_CFG_") -> "EngineConfig":
        """Build a config from environment overrides on the defaults —
        the reference's load_configuration + env override pass
        (src/main.rs:106-156, src/config.rs env parsing) as a typed
        dataclass walk.

        ``GRAFT_CFG_<FIELD>`` overrides a top-level field;
        ``GRAFT_CFG_WINDOWS_<FIELD>`` / ``GRAFT_CFG_FUNNEL_<FIELD>``
        override the nested sections. Values are coerced to the field's
        declared type; an unknown name or an uncoercible value raises
        ``ValueError`` naming the variable (fail fast, never silently
        ignore a typo'd knob). The result is ``validate()``d.
        """
        import os as _os
        from dataclasses import fields as _fields

        src = dict(env if env is not None else _os.environ)
        picked = {k: v for k, v in src.items() if k.startswith(prefix)}

        def coerce(name: str, raw: str, ftype: str):
            try:
                if "bool" in ftype:
                    if raw.lower() in ("1", "true", "yes", "on"):
                        return True
                    if raw.lower() in ("0", "false", "no", "off"):
                        return False
                    raise ValueError(raw)
                if "tuple" in ftype:  # comma-separated ints, e.g. "250,450"
                    return tuple(int(x) for x in raw.split(","))
                if "str" in ftype:  # also covers `str | None`
                    return None if raw.lower() == "none" else raw
                if "float" in ftype:
                    return float(raw)
                if "int" in ftype:  # also covers `int | None`
                    return None if raw.lower() == "none" else int(raw)
                raise ValueError(f"unsupported type {ftype}")
            except ValueError as e:
                raise ValueError(
                    f"env override {name}={raw!r}: cannot coerce to "
                    f"{ftype}"
                ) from e

        sections = {"WINDOWS": WindowConfig, "FUNNEL": FunnelConfig}
        top: dict = {}
        nested: dict[str, dict] = {k: {} for k in sections}
        simple = {f.name: str(f.type) for f in _fields(cls)
                  if f.name not in ("windows", "funnel")}
        for name, raw in sorted(picked.items()):
            key = name[len(prefix):]
            sec = next((s for s in sections if key.startswith(s + "_")), None)
            if sec is not None:
                fname = key[len(sec) + 1:].lower()
                ftypes = {f.name: str(f.type) for f in _fields(sections[sec])}
                if fname not in ftypes:
                    raise ValueError(
                        f"unknown config env var {name} "
                        f"(no field {fname!r} in {sections[sec].__name__})")
                nested[sec][fname] = coerce(name, raw, ftypes[fname])
            else:
                fname = key.lower()
                if fname not in simple:
                    raise ValueError(f"unknown config env var {name}")
                top[fname] = coerce(name, raw, simple[fname])
        if nested["WINDOWS"]:
            top["windows"] = WindowConfig(**nested["WINDOWS"])
        if nested["FUNNEL"]:
            top["funnel"] = FunnelConfig(**nested["FUNNEL"])
        cfg = cls(**top)
        cfg.validate()
        return cfg


DEFAULT_CONFIG = EngineConfig()
