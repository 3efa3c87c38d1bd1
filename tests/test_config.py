"""Config validation matrix + env-override loading.

Ports the reference's config test strategy (SURVEY §5: every invalid
field -> a specific error; src/config.rs:43-49 validate,
src/main.rs:106-156 env override pass).
"""

import pytest

from bitquery_kafka_streams_rust_ray.config import (EngineConfig, FunnelConfig,
                                                    WindowConfig)


# --- validation matrix: every invalid field -> its specific error ---------


@pytest.mark.parametrize(
    "kwargs, msg",
    [
        ({"dedup_window_s": 0}, "dedup_window_s"),
        ({"allowed_lateness_s": -1}, "allowed_lateness_s"),
        ({"batch_size": 0}, "batch sizes"),
        ({"read_batch_size": -5}, "batch sizes"),
        ({"state_shards": 0}, "state_shards"),
        ({"files_per_epoch": 0}, "files_per_epoch"),
        ({"epoch_replay_budget": -1}, "epoch_replay_budget"),
        ({"sink_breaker_threshold": 0}, "sink_breaker_threshold"),
        ({"topk_hosts": -1}, "topk_hosts"),
        ({"topk_max_keys": -2}, "topk_max_keys"),
    ],
)
def test_validate_rejects_each_bad_field(kwargs, msg):
    with pytest.raises(ValueError, match=msg):
        EngineConfig(**kwargs).validate()


def test_validate_accepts_defaults():
    EngineConfig().validate()


def test_window_config_rejects_nonmultiple_slide():
    with pytest.raises(ValueError, match="multiple"):
        WindowConfig(sliding_size_s=100, sliding_slide_s=33)


def test_funnel_needs_two_stages():
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState

    with pytest.raises(ValueError, match="two stages"):
        FunnelState(1, 10)


# --- env overrides --------------------------------------------------------


def test_from_env_defaults_when_empty():
    assert EngineConfig.from_env(env={}) == EngineConfig()


def test_from_env_overrides_typed_fields():
    cfg = EngineConfig.from_env(env={
        "GRAFT_CFG_DEDUP_WINDOW_S": "120",
        "GRAFT_CFG_MIN_WEIGHTED_LEN": "2.5",
        "GRAFT_CFG_FSYNC_OUTPUT": "true",
        "GRAFT_CFG_HTTP_PORT": "none",
        "GRAFT_CFG_STATE_SHARDS": "4",
        "GRAFT_CFG_DEDUP_SPILL_DIR": "/tmp/spill",
        "UNRELATED": "ignored",
    })
    assert cfg.dedup_window_s == 120
    assert cfg.min_weighted_len == 2.5
    assert cfg.fsync_output is True
    assert cfg.http_port is None
    assert cfg.state_shards == 4
    assert cfg.dedup_spill_dir == "/tmp/spill"
    assert EngineConfig.from_env(env={
        "GRAFT_CFG_DEDUP_SPILL_DIR": "none"}).dedup_spill_dir is None
    # untouched fields keep defaults
    assert cfg.batch_size == EngineConfig().batch_size


def test_from_env_nested_sections():
    cfg = EngineConfig.from_env(env={
        "GRAFT_CFG_WINDOWS_TUMBLING_SIZE_S": "30",
        "GRAFT_CFG_WINDOWS_SESSION_GAP_S": "90",
        "GRAFT_CFG_FUNNEL_WITHIN_S": "300",
        "GRAFT_CFG_FUNNEL_BOUNDS": "100,200",
    })
    assert cfg.windows.tumbling_size_s == 30
    assert cfg.windows.session_gap_s == 90
    assert cfg.windows.sliding_size_s == WindowConfig().sliding_size_s
    assert cfg.funnel.within_s == 300
    assert cfg.funnel.bounds == (100, 200)
    assert cfg.funnel.n_stages == 3


def test_from_env_unknown_var_fails_fast():
    with pytest.raises(ValueError, match="GRAFT_CFG_DEDUP_WINDOWS"):
        EngineConfig.from_env(env={"GRAFT_CFG_DEDUP_WINDOWS": "10"})
    with pytest.raises(ValueError, match="GRAFT_CFG_WINDOWS_SIZE"):
        EngineConfig.from_env(env={"GRAFT_CFG_WINDOWS_SIZE": "10"})


def test_from_env_bad_value_names_the_variable():
    with pytest.raises(ValueError, match="GRAFT_CFG_BATCH_SIZE"):
        EngineConfig.from_env(env={"GRAFT_CFG_BATCH_SIZE": "many"})


def test_from_env_result_is_validated():
    with pytest.raises(ValueError, match="state_shards"):
        EngineConfig.from_env(env={"GRAFT_CFG_STATE_SHARDS": "0"})


def test_validate_round3_knobs():
    import dataclasses

    import pytest

    from bitquery_kafka_streams_rust_ray.config import EngineConfig

    for field, bad in (("sketch_distinct_p", 3), ("sketch_distinct_p", 19),
                       ("lock_lease_s", 0.0),
                       ("exchange_ack_timeout_s", -1.0),
                       ("exchange_stall_grace_s", 0.0)):
        with pytest.raises(ValueError):
            dataclasses.replace(EngineConfig(), **{field: bad}).validate()
    # env overrides reach the new fields through the generic field walk
    c = EngineConfig.from_env({"GRAFT_CFG_SKETCH_DISTINCT": "true",
                               "GRAFT_CFG_LOCK_LEASE_S": "7200"})
    assert c.sketch_distinct is True and c.lock_lease_s == 7200.0
