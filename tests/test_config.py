"""Config parity with the reference (config.py:7-62): env-var loading
and the deprecated ``sqlite`` backend alias (cdc_system.py:32-36)."""

from __future__ import annotations

from cdc_system_spark.config import CDCConfig, DatabaseConfig, DatabaseType


def test_sqlite_env_aliases_to_parquet(monkeypatch):
    # a reference .env carrying SOURCE_DB_TYPE=sqlite must port cleanly;
    # the alias is resolved AT THE BOUNDARY so no downstream code ever
    # sees SQLITE (it would otherwise have to remember .effective)
    monkeypatch.setenv("SOURCE_DB_TYPE", "sqlite")
    monkeypatch.setenv("SOURCE_DB_PATH", "/tmp/source.db")
    cfg = DatabaseConfig.from_env("SOURCE")
    assert cfg.db_type is DatabaseType.PARQUET
    assert cfg.path == "/tmp/source.db"
    # the enum-level alias resolution stays available for direct users
    assert DatabaseType.SQLITE.effective is DatabaseType.PARQUET


def test_non_alias_types_resolve_to_themselves():
    for t in (DatabaseType.PARQUET, DatabaseType.POSTGRESQL, DatabaseType.MYSQL):
        assert t.effective is t


def test_cdc_config_env_names_match_reference(monkeypatch):
    # same env names as reference config.py:50-62
    monkeypatch.setenv("CDC_BATCH_SIZE", "7")
    monkeypatch.setenv("CDC_SYNC_INTERVAL", "2")
    monkeypatch.setenv("CDC_CAPTURE_STRATEGY", "timestamp")
    cfg = CDCConfig.from_env()
    assert cfg.batch_size == 7
    assert cfg.sync_interval_seconds == 2
    assert cfg.capture_strategy == "timestamp"


def test_defaults_match_reference():
    cfg = CDCConfig()
    assert cfg.batch_size == 100          # config.py:33
    assert cfg.sync_interval_seconds == 5  # config.py:34
    assert cfg.health_pending_threshold == 1000  # cdc_system.py:373
