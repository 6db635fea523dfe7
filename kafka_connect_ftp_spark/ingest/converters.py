"""Record converters — the reference's pluggable projection surface.

X1 (FileConverter, FileConverter.scala:14-27) chooses the key style;
X2 (SourceRecordConverter, SourceRecordConverter.scala:9-17) is a 1→N
record mapper (README.md:61-92 shows a CSV-line splitter). Both become
DataFrame → DataFrame transforms over RECORD_SCHEMA rows; the registry
replaces reflective class loading with a name → callable lookup.

All converters are pure column expressions (codegen'd, no Python UDFs)
except ``gunzip``, which has no SQL-builtin equivalent and uses an
Arrow-batched pandas UDF (zlib does the work in C); ``csv_lines`` is the
explode-based 1→N example (SURVEY.md §2.7 U2).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Converter = Callable[[DataFrame], DataFrame]

_REGISTRY: dict[str, Converter] = {}


def register_converter(name: str):
    def deco(fn: Converter) -> Converter:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_converter(name: str) -> Converter:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown converter {name!r}; available: {sorted(_REGISTRY)}") from None


# X1 key-style converters project records down to the Kafka (topic, key,
# value) contract and drop key_name/key_offset — valid only as the final
# framing step, never as ftp.sourcerecordconverter (X2), whose output
# must keep flowing through record-schema sinks
_KEY_STYLE = frozenset({"string_key", "struct_key"})


def _get_non_key_converter(name: str, knob: str) -> Converter:
    """Resolve a converter for ``knob``, rejecting the X1 key-style
    projections (they would break record-schema consumers mid-poll —
    fail at configuration time instead). The unknown-name error lists
    ONLY the names the knob actually accepts (review 9b: advertising
    key-style names the same knob then rejects sent users into a
    second startup failure)."""
    avail = sorted(set(_REGISTRY) - _KEY_STYLE)
    if name in _KEY_STYLE:
        raise KeyError(
            f"{name!r} is a key-style (X1) converter; {knob} takes a "
            f"non-key-style converter — available: {avail}"
        )
    if name not in _REGISTRY:
        raise KeyError(f"unknown converter {name!r} for {knob}; available: {avail}")
    return _REGISTRY[name]


def get_record_converter(name: str) -> Converter:
    """Resolve an X2 record converter (1→N mapper) —
    ``ftp.sourcerecordconverter``."""
    return _get_non_key_converter(name, "ftp.sourcerecordconverter")


def get_file_converter(name: str) -> Converter:
    """Resolve a FILE converter (``ftp.fileconverter`` parity —
    FtpSourceConfig.scala:45, FileConverter.scala: runs on file BODIES
    before the record converter)."""
    return _get_non_key_converter(name, "ftp.fileconverter")


@register_converter("nop")
def nop(records: DataFrame) -> DataFrame:
    """NopSourceRecordConverter (SourceRecordConverter.scala:14-17)."""
    return records


def _quarantine_cols(records: DataFrame) -> list[str]:
    """Observability columns (gunzip's ``decode_error``) that selecting
    converters must carry through — otherwise the quarantine flag dies at
    the first projection and dead-letter routing is impossible."""
    return [c for c in ("decode_error",) if c in records.columns]


@register_converter("string_key")
def string_key(records: DataFrame) -> DataFrame:
    """String key style: key = path, value = bytes
    (SimpleFileConverter.scala:43-52)."""
    return records.select(
        "topic", F.col("key_name").alias("key"), F.col("value"), *_quarantine_cols(records)
    )


@register_converter("struct_key")
def struct_key(records: DataFrame) -> DataFrame:
    """Struct key style: key = FileInfo{name, offset}
    (SimpleFileConverter.scala:38-41,54-66)."""
    return records.select(
        "topic",
        F.struct(
            F.col("key_name").alias("name"), F.col("key_offset").alias("offset")
        ).alias("key"),
        F.col("value"),
        *_quarantine_cols(records),
    )


@register_converter("csv_lines")
def csv_lines(records: DataFrame) -> DataFrame:
    """1→N: split each body into newline-delimited records, preserving the
    intra-file line offset in the key (the README's CSV example). Empty
    trailing segments are dropped.

    Quarantined records (``decode_error=true`` from gunzip) are passed
    through UN-SPLIT as a single record holding the original bytes:
    decoding raw gzip as UTF-8 would lossily mangle the payload (U+FFFD
    substitution — unreplayable from any dead-letter topic) and under
    ``spark.sql.ansi.enabled`` would throw, reintroducing the exact
    poison-pill the quarantine exists to prevent."""
    extra = _quarantine_cols(records)
    splittable = records
    passthrough = None
    if extra:
        passthrough = records.filter(F.col("decode_error")).select(
            "topic",
            "key_name",
            "key_offset",
            F.lit(0).cast("long").alias("line_no"),
            F.col("value"),
            *extra,
        )
        splittable = records.filter(~F.col("decode_error"))
    lines = splittable.select(
        "topic",
        "key_name",
        "key_offset",
        *extra,
        F.posexplode(F.split(F.decode(F.col("value"), "UTF-8"), "\r?\n")).alias("pos", "line"),
    )
    out = lines.filter(F.length("line") > 0).select(
        "topic",
        "key_name",
        "key_offset",
        F.col("pos").cast("long").alias("line_no"),
        F.encode("line", "UTF-8").alias("value"),
        *extra,
    )
    return out.unionByName(passthrough) if passthrough is not None else out


@register_converter("gunzip")
def gunzip(records: DataFrame) -> DataFrame:
    """Transparently decompress gzipped bodies (magic ``1f 8b``); other
    bodies pass through untouched. Compose with ``csv_lines`` for the
    common gzipped-log-drop case. Arrow-batched; bytes stay in the
    partition that fetched them.

    A corrupt/truncated gzip member passes its RAW bytes through instead
    of failing the task — an unraisable record would poison EVERY
    subsequent tick (state never advances past it), halting all monitors
    — but is flagged with ``decode_error=true`` so the quarantine is
    observable (route those rows to a dead-letter topic or alert on the
    count) rather than binary garbage flowing on silently as content."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("value binary, decode_error boolean")
    def _gunzip(bodies: pd.Series) -> pd.DataFrame:
        import gzip as _gzip

        vals, errs = [], []
        for b in bodies:
            if b is not None and len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
                try:
                    vals.append(_gzip.decompress(bytes(b)))
                    errs.append(False)
                except Exception:
                    vals.append(bytes(b))
                    errs.append(True)
            else:
                vals.append(b)
                errs.append(False)
        return pd.DataFrame({"value": vals, "decode_error": errs})

    return (
        records.withColumn("_gz", _gunzip(F.col("value")))
        .withColumn("value", F.col("_gz.value"))
        .withColumn("decode_error", F.col("_gz.decode_error"))
        .drop("_gz")
    )


def to_kafka_frame(records: DataFrame, key_style: str = "string_key") -> DataFrame:
    """Project records into the Kafka sink contract: (topic, key, value).

    ``df.write.format("kafka")`` routes on the per-row ``topic`` column
    natively — the engine-side equivalent of the reference's monitor2topic
    routing (FtpSourceTask.scala:24-25,60-63). Struct keys are serialized
    as JSON (the Connect struct schema's wire format is broker-side
    concern; JSON keeps the example dependency-free).

    The Kafka contract is exactly (topic, key, value), so quarantine
    flags (gunzip's ``decode_error``) do NOT survive this projection —
    branch BEFORE it for dead-letter routing, e.g.::

        bad = records.filter("decode_error")
        good = records.filter(~F.col("decode_error"))
        to_kafka_frame(bad.withColumn("topic", F.lit("dead-letter")))
    """
    projected = get_converter(key_style)(records)
    key = projected["key"]
    if dict(projected.dtypes)["key"].startswith("struct"):
        key = F.to_json(key)
    return projected.select("topic", key.cast("binary").alias("key"), "value")
