"""Config parity tests against the reference's example.properties values
(example.properties:1-21, FtpSourceConfig.scala:35-47)."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.ingest.config import FtpEngineConfig, parse_iso_duration

EXAMPLE_PROPS = {
    "ftp.address": "ftp.example.org:2121",
    "ftp.user": "alice",
    "ftp.password": "secret",
    "ftp.refresh": "PT1M",
    "ftp.file.maxage": "P14D",
    "ftp.keystyle": "struct",
    "ftp.monitor.tail": "/logs/:logs-topic,/metrics/*.csv:metrics",
    "ftp.monitor.update": "/config/:config-topic",
}


def test_parse_iso_durations():
    assert parse_iso_duration("PT1M") == 60.0
    assert parse_iso_duration("P14D") == 14 * 86400.0
    assert parse_iso_duration("PT30M") == 1800.0
    assert parse_iso_duration("PT2H30M15S") == 9015.0
    assert parse_iso_duration("P1DT1S") == 86401.0
    with pytest.raises(ValueError):
        parse_iso_duration("14 days")


def test_from_props_full():
    cfg = FtpEngineConfig.from_props(EXAMPLE_PROPS)
    assert (cfg.host, cfg.port, cfg.user) == ("ftp.example.org", 2121, "alice")
    assert cfg.refresh_seconds == 60.0
    assert cfg.max_age_seconds == 14 * 86400.0
    assert cfg.max_backoff_seconds == 1800.0  # default PT30M
    assert cfg.max_poll_records == 10000  # default
    assert cfg.key_converter_name == "struct_key"
    mon = {(m.path, m.topic, m.tail) for m in cfg.monitors}
    assert mon == {
        ("/logs/", "logs-topic", True),
        ("/metrics/*.csv", "metrics", True),
        ("/config/", "config-topic", False),
    }


def test_monitor_splits_on_first_colon():
    # reference regex '([^:]*):(.*)': path may not contain ':', topic may
    cfg = FtpEngineConfig.from_props({"ftp.monitor.update": "/logs/:raw:v1"})
    [(path, topic)] = [(m.path, m.topic) for m in cfg.monitors]
    assert (path, topic) == ("/logs/", "raw:v1")


def test_invalid_keystyle_and_monitor():
    with pytest.raises(ValueError):
        FtpEngineConfig.from_props({"ftp.keystyle": "banana"})
    with pytest.raises(ValueError):
        FtpEngineConfig.from_props({"ftp.monitor.tail": "no-topic-here"})


def test_build_pipeline_local_remap(spark, tmp_path):
    cfg = FtpEngineConfig.from_props(
        {"ftp.monitor.update": "/data/:files", "ftp.max.poll.records": "7"}
    )
    pipe = cfg.build_pipeline(spark, str(tmp_path / "state"), local_root=str(tmp_path))
    assert pipe.max_files_per_poll == 7
    assert pipe.monitors[0].path == str(tmp_path) + "/data/"
    assert pipe.monitors[0].topic == "files"


def test_protocol_ftps_parses_and_validates():
    from kafka_connect_ftp_spark.ingest.config import FtpEngineConfig

    cfg = FtpEngineConfig.from_props(
        {"ftp.monitor.update": "/u/:t", "ftp.protocol": "FTPS"}
    )
    assert cfg.tls is True
    assert FtpEngineConfig.from_props({"ftp.monitor.update": "/u/:t"}).tls is False
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ftp.protocol"):
        FtpEngineConfig.from_props({"ftp.protocol": "sftp"})


def test_fileconverter_parses():
    cfg = FtpEngineConfig.from_props({"ftp.fileconverter": "gunzip"})
    assert cfg.file_converter == "gunzip"
    assert FtpEngineConfig.from_props({}).file_converter == "nop"


def test_reference_class_names_alias_to_nop():
    # the reference's Type.CLASS knob values must keep dropping in
    # unchanged (review 9b): its two shipped classes are behavioral
    # no-ops here
    cfg = FtpEngineConfig.from_props({
        "ftp.fileconverter":
            "com.eneco.trading.kafka.connect.ftp.source.SimpleFileConverter",
        "ftp.sourcerecordconverter":
            "com.eneco.trading.kafka.connect.ftp.source.NopSourceRecordConverter",
    })
    assert cfg.file_converter == "nop" and cfg.converter == "nop"
    assert FtpEngineConfig.from_props(
        {"ftp.fileconverter": "SimpleFileConverter"}
    ).file_converter == "nop"


def test_swapped_converter_knobs_do_not_alias(tmp_path):
    """ADVICE r9: the alias map is per knob — the reference class that
    belongs to the OTHER knob must pass through un-aliased so the
    registry validation catches the swapped-knob misconfiguration
    instead of silently running 'nop'."""
    cfg = FtpEngineConfig.from_props({
        "ftp.fileconverter":
            "com.eneco.trading.kafka.connect.ftp.source.NopSourceRecordConverter",
        "ftp.sourcerecordconverter":
            "com.eneco.trading.kafka.connect.ftp.source.SimpleFileConverter",
    })
    assert cfg.file_converter.endswith("NopSourceRecordConverter")
    assert cfg.converter.endswith("SimpleFileConverter")
