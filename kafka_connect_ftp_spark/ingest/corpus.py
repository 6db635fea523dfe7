"""Corpus readers: load text corpora in the common LLM-pipeline interchange
formats into the engine's canonical documents frame.

``read_corpus(spark, path, fmt)`` returns a frame with the same shape as
the ``documents`` testdata table — ``doc_id BIGINT, text STRING,
source STRING`` (+ passthrough metadata columns) — so every documents-grain
operator (dedup, text profile, quality gate, governance, chunking, packing)
runs unchanged on external corpora:

- ``jsonl``: one JSON object per line (the de-facto corpus format);
  ``text_field`` selects the payload key, other keys pass through.
- ``csv``: header row expected; ``text_field`` selects the column.
- ``text``: one document per FILE (``wholetext``) or per LINE.
- ``parquet`` / ``orc``: columnar corpora; ``text_field`` renamed to
  ``text``.
- ``warc``: web-crawl archives (Common Crawl layout) via
  ``ingest/warc.py`` — successful HTTP responses become documents;
  ``warc_strip_html`` / ``warc_clean`` run the JVM-side visible-text
  extraction and unicode cleanup in the same scan.
- ``wds``: WebDataset tar shards exported by ``operators/wds.py`` —
  the round trip that lets curation re-runs and audits start from
  delivered shards (``wds_fields`` maps columns to member extensions,
  default ``{"text": "txt"}``).

``doc_id`` synthesis: corpora rarely ship stable ids, and
``monotonically_increasing_id`` is partition-layout-dependent (re-running
after a repartition renumbers everything — poison for deterministic
splits/dedup decisions). The synthesized id is ``xxhash64(source, text)``:
a pure function of content + provenance, so it survives repartitioning,
retries and incremental re-runs, and exact duplicates WITHIN one source
collide on purpose — they are the same document, and downstream exact
dedup treats them as such. Pass ``id_field`` to keep a trusted upstream id
instead.

Scale: every reader is a plain DataFrame source (splittable scans,
predicate/column pushdown where the format supports it) plus map-side
projections — no shuffle, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = ("jsonl", "csv", "text", "parquet", "orc", "warc", "wds")


_NUMERIC_ID_TYPES = ("tinyint", "smallint", "int", "bigint")


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    *,
    text_field: str = "text",
    id_field: str | None = None,
    source: str | None = None,
    per_line: bool = True,
    multiline_csv: bool = False,
    schema=None,
    wds_fields: dict[str, str] | None = None,
    warc_strip_html: bool = False,
    warc_clean: bool = False,
) -> DataFrame:
    """Load a corpus into the canonical ``(doc_id, text, source, ...)``
    frame. ``source`` defaults to the input file name of each row
    (provenance column — mixing rates and governance salts key on it).
    For ``fmt="text"``, ``per_line=False`` reads one document per file.

    When ``text_field`` names a non-``text`` column and the corpus ALSO
    has a ``text`` column, the pre-existing one is kept as ``orig_text``
    metadata; a pre-existing ``source`` column is likewise preserved as
    ``orig_source`` (the synthesized column is provenance, not payload).
    A pre-existing ``doc_id`` column is an error unless claimed with
    ``id_field="doc_id"`` — overwriting a trusted-looking id with a
    synthesized hash would be silent data loss.
    Integer upstream ids pass through ``id_field`` unchanged;
    string ids (UUIDs etc.) are hashed with xxhash64 — still
    deterministic per id, but not numerically equal to the original.

    ``multiline_csv=True`` enables quoted embedded newlines at the cost
    of unsplittable files (one task per file) — leave it off for large
    single-file corpora.

    ``schema`` (jsonl only): a ``StructType`` or DDL string with the
    corpus's data fields. When omitted, one schema-inference pass over
    the files runs first (exactly what ``spark.read.json`` does); at
    production scale pass the known schema to make the read single-pass."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")

    if wds_fields is not None and fmt != "wds":
        raise ValueError("wds_fields only applies to fmt='wds'")
    if (warc_strip_html or warc_clean) and fmt != "warc":
        raise ValueError("warc_strip_html/warc_clean only apply to fmt='warc'")

    if fmt == "wds":
        # exported shards carry their own conventions (sample_key = the
        # writer's zero-padded id, shard = provenance), so the generic
        # field plumbing below does not apply — reject its knobs rather
        # than silently ignore them (the warc rule)
        bad = sorted(
            k
            for k, v in {
                "text_field": text_field != "text",
                "id_field": id_field is not None,
                "source": source is not None,
                "schema": schema is not None,
            }.items()
            if v
        )
        if bad:
            raise ValueError(
                f"fmt='wds' derives its own fields; {bad} do not apply "
                "(source = shard name, doc_id inverts the writer's key)"
            )
        from kafka_connect_ftp_spark.operators.wds import read_wds_shards

        fields = dict(wds_fields or {"text": "txt"})
        if "text" not in fields:
            raise ValueError(f"wds_fields must include a 'text' member, got {fields}")
        df = read_wds_shards(spark, path, fields=fields)
        # doc_id inverts write_wds_shards' key convention: the writer
        # zero-pads INTEGER ids to >= 12 TOTAL chars ('%012d'), which for
        # negatives means a sign + >= 11 digits (-5 -> '-00000000005') —
        # and negative ids are the NORM here, not an edge: the package's
        # own doc_id convention is xxhash64(...), signed, negative about
        # half the time (warc_to_corpus, read_corpus synthesis). Only
        # keys matching one of those exact shapes cast back (try_cast —
        # overflow falls through to the hash); everything else is a
        # string id and HASHES, the id_field convention above — a plain
        # numeric string like '12345' (written verbatim, 5 chars) must
        # not collide with the true integer id 12345. Residual
        # ambiguity: a STRING id that itself matches the padded shape
        # reads back as the number — an accepted limit of the encoding.
        return (
            df.withColumnRenamed("shard", "source")
            .withColumn(
                "doc_id",
                F.when(
                    F.col("sample_key").rlike(r"^(-[0-9]{11,}|[0-9]{12,})$"),
                    F.col("sample_key").try_cast("bigint"),
                ).otherwise(F.xxhash64("sample_key")),
            )
            .withColumn("doc_id", F.coalesce("doc_id", F.xxhash64("sample_key")))
            .select("doc_id", "text", "source", "sample_key", *(c for c in fields if c != "text"))
        )

    if fmt == "warc":
        # crawl dumps carry their own id/source/text conventions
        # (ingest/warc.py: doc_id = xxhash64(host, body), source = host)
        # so the generic field plumbing below does not apply — and per
        # this function's no-silent-clobber rule, passing those knobs
        # anyway is an error rather than a silent ignore
        ignored = {
            "text_field": text_field != "text",
            "id_field": id_field is not None,
            "source": source is not None,
            "schema": schema is not None,
        }
        bad = sorted(k for k, v in ignored.items() if v)
        if bad:
            raise ValueError(
                f"fmt='warc' derives its own fields; {bad} do not apply "
                "(source = response host, doc_id = xxhash64(source, text))"
            )
        from kafka_connect_ftp_spark.ingest.warc import read_warc, warc_to_corpus

        return warc_to_corpus(
            read_warc(spark, path), strip_html=warc_strip_html, clean=warc_clean
        )

    if fmt == "jsonl":
        from pyspark.sql.types import StringType, StructField, StructType

        if schema is None:
            inferred = spark.read.json(path).schema  # inference pass only
        elif isinstance(schema, StructType):
            inferred = schema
        else:
            inferred = StructType.fromDDL(schema)
        data_fields = [f for f in inferred.fields if f.name != "_corrupt_record"]
        # per this function's no-silent-clobber rule, upstream fields
        # already named decode_error/corrupt_record are an error
        clash = {"decode_error", "corrupt_record"} & {f.name for f in data_fields}
        if clash:
            raise ValueError(
                f"corpus already has quarantine column(s) {sorted(clash)}; rename "
                "them upstream (read_corpus reserves these names for its own flags)"
            )
        # Lines are parsed HERE (splittable text scan + from_json with a
        # corrupt-record field) rather than by spark.read.json: the json
        # source forbids any query whose pruned scan schema is only the
        # corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
        # COLUMN), which breaks the documented quarantine patterns —
        # filter('decode_error').count() alerts and corrupt_record
        # dead-letter replay. from_json carries no such restriction, and
        # input_file_name() provenance still works on the text scan.
        # Unparseable lines surface under the package-wide quarantine
        # convention (decode_error, like gunzip) instead of flowing on as
        # NULL-text ghost documents; both quarantine columns are ALWAYS
        # present (decode_error=false, corrupt_record=NULL on a clean
        # corpus) so pipelines filtering on them don't break
        # schema-dependently on the first clean input.
        parse_schema = StructType(
            data_fields + [StructField("corrupt_record", StringType())]
        )
        df = (
            spark.read.text(path)
            # the json source skips whitespace-only lines; match it.
            # rlike(\S), not trim() != '' — trim strips only ASCII spaces,
            # so a tab-only line would slip through as a NULL-text ghost
            .filter(F.col("value").rlike(r"\S"))
            .select(
                F.from_json(
                    "value",
                    parse_schema,
                    {"columnNameOfCorruptRecord": "corrupt_record", "mode": "PERMISSIVE"},
                ).alias("_parsed")
            )
            .select("_parsed.*")
            .withColumn("decode_error", F.col("corrupt_record").isNotNull())
        )
    elif fmt == "csv":
        reader = spark.read.option("header", "true")
        if multiline_csv:
            reader = reader.option("multiLine", "true")
        df = reader.csv(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        df = spark.read.orc(path)
    else:  # text
        # NB: must be the keyword form — DataFrameReader.text() overwrites
        # a previously-set "wholetext" option with its own default
        df = spark.read.text(path, wholetext=not per_line).withColumnRenamed(
            "value", text_field
        )

    if text_field not in df.columns:
        raise ValueError(f"column {text_field!r} not found; corpus has {df.columns}")

    # provenance/id synthesis must not silently eat upstream metadata
    # (mirror of the orig_text handling below): a pre-existing 'source'
    # column is preserved as 'orig_source'; a pre-existing 'doc_id' the
    # caller did NOT claim via id_field is ambiguous — refuse rather than
    # overwrite a trusted-looking id with a synthesized hash
    if "source" in df.columns:
        if "orig_source" in df.columns:
            raise ValueError(
                "corpus has both 'source' and 'orig_source' columns; rename one upstream"
            )
        df = df.withColumnRenamed("source", "orig_source")
    if "doc_id" in df.columns and id_field != "doc_id":
        raise ValueError(
            "corpus already has a 'doc_id' column; pass id_field='doc_id' to keep "
            "it, or rename it upstream to let read_corpus synthesize content ids"
        )

    src_col = F.lit(source) if source is not None else F.input_file_name()
    out = df.withColumn("source", src_col)
    if text_field != "text":
        if "text" in out.columns:
            if "orig_text" in out.columns:
                raise ValueError(
                    "corpus has both 'text' and 'orig_text' columns alongside "
                    f"text_field={text_field!r}; rename one upstream"
                )
            out = out.withColumnRenamed("text", "orig_text")
        out = out.withColumnRenamed(text_field, "text")
    out = out.withColumn("text", F.col("text").cast("string"))

    if id_field is not None:
        if id_field not in df.columns:
            raise ValueError(f"id column {id_field!r} not found; corpus has {df.columns}")
        id_type = dict(out.dtypes)[id_field]
        if id_type in _NUMERIC_ID_TYPES:
            out = out.withColumn("doc_id", F.col(id_field).cast("long"))
        else:
            # string/uuid ids: hash rather than cast — an ANSI cast would
            # crash mid-job on the first non-numeric value
            out = out.withColumn("doc_id", F.xxhash64(F.col(id_field).cast("string")))
    else:
        # quarantined rows (NULL text) hash their raw corrupt line instead:
        # xxhash64 SKIPS null arguments, so plain (source, text) would
        # collapse every corrupt line in a file onto one doc_id and
        # downstream doc_id-keyed steps would silently drop all but one
        id_text = (
            F.coalesce(F.col("text"), F.col("corrupt_record"))
            if "corrupt_record" in out.columns
            else F.col("text")
        )
        out = out.withColumn("doc_id", F.xxhash64("source", id_text))

    meta = [c for c in out.columns if c not in ("doc_id", "text", "source")]
    return out.select("doc_id", "text", "source", *meta)
