"""File-system sources (SURVEY §2.1, S1-S5) — the reference's
extractors re-expressed as declarative Spark reads.

Reference: `FilesListExtractor` walks a directory tree in Python and
yields one dict per matching file (extractors/files.py:7-26);
`FileTextReaderTransformer` / `FileToTextLinesTransformer` then re-open
each path mid-pipeline (transformers/files.py:17-88). Here listing,
suffix filtering (pushed down via pathGlobFilter — never listed, not
filtered after the fact) and content reading are one distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def files_list(
    spark: SparkSession,
    input_dir: str | list[str],
    file_pattern: str = ".txt",
    output_key: str = "file_path",
) -> DataFrame:
    """S1/S2 `FilesListExtractor` / `FoldersFilesListExtractor`
    (extractors/files.py:7-49): one row per file under the root(s)
    whose name ends with ``file_pattern``.

    Uses the binaryFile source with `pathGlobFilter` so the pattern is
    applied during distributed listing (driver never materializes the
    tree) — only paths are projected, so file contents are not read.
    """
    paths = [input_dir] if isinstance(input_dir, str) else list(input_dir)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{file_pattern}")
        .option("recursiveFileLookup", "true")
        .load(paths)
    )
    return df.select(F.col("path").alias(output_key))


def read_whole_files(
    spark: SparkSession,
    input_dir: str | list[str],
    file_pattern: str = ".txt",
    path_key: str = "file_path",
    content_key: str = "content",
) -> DataFrame:
    """S4 `FileTextReaderTransformer` (transformers/files.py:56-88):
    path + whole-file UTF-8 content, one row per file.

    The reference reads each file twice (count pass + distinct pass,
    example/main.py:77-80 vs 101-106); callers here read once and fan
    out transformations from the same DataFrame.
    """
    paths = [input_dir] if isinstance(input_dir, str) else list(input_dir)
    # NOTE: wholetext must be the boolean kwarg — the string option
    # ("wholetext", "true") is silently ignored by Spark 4's text source
    df = (
        spark.read.option("pathGlobFilter", f"*{file_pattern}")
        .option("recursiveFileLookup", "true")
        .text(paths, wholetext=True)
    )
    return df.select(
        F.input_file_name().alias(path_key), F.col("value").alias(content_key)
    )


def read_file_lines(
    spark: SparkSession,
    input_dir: str | list[str],
    file_pattern: str = ".txt",
    path_key: str = "file_path",
    line_key: str = "line",
    skip_blank: bool = True,
) -> DataFrame:
    """S5 `FileToTextLinesTransformer` (transformers/files.py:17-54):
    one row per (stripped, non-blank) line, with originating path."""
    paths = [input_dir] if isinstance(input_dir, str) else list(input_dir)
    df = (
        spark.read.option("pathGlobFilter", f"*{file_pattern}")
        .option("recursiveFileLookup", "true")
        .text(paths)
    )
    out = df.select(
        F.input_file_name().alias(path_key),
        F.trim(F.col("value")).alias(line_key),
    )
    if skip_blank:
        out = out.filter(F.length(F.col(line_key)) > 0)
    return out


def _register_csv_roundtrip() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "csv_roundtrip_agg",
        oracle="""
        SELECT l_returnflag,
               count(*) AS n,
               (floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                      * 100 + 0.5) / 100) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
        """,
    )
    def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """CSV source/sink roundtrip: stage three lineitem columns
        through the L4 ';'-CSV writer (sinks.csv_load), read them back
        with an explicit schema through the CSV SOURCE — the read path
        no other registry entry exercises — and aggregate; the oracle
        runs the same aggregate on the original parquet, so the
        roundtrip must be lossless (delimiters, headers, numeric
        parsing). Same staging discipline as streaming_foreach_batch:
        one fixed dir per sf, exclusive flock, eager localCheckpoint
        under the lock so the returned frame survives a concurrent
        run's overwrite. quantity stages as its DECIMAL(30,2) cents
        rendering so the text roundtrip is exact (a raw double would
        print shortest-repr and reparse exactly too, but the decimal
        form also pins the column's scale in the file)."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table
        from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
            round_half_up,
        )
        from tiny_etl_multiproc_bigdata_spark.sinks import csv_load

        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_returnflag",
            F.col("l_quantity").cast("decimal(30,2)").alias("l_quantity"),
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_csvrt_{tag}")
        data_dir = os.path.join(root, "data")
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                csv_load(li, data_dir)
                back = (
                    spark.read.option("sep", ";")
                    .option("header", "true")
                    .schema(
                        "l_orderkey bigint, l_returnflag string, "
                        "l_quantity decimal(30,2)"
                    )
                    .csv(data_dir)
                    .localCheckpoint(eager=True)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.groupBy("l_returnflag").agg(
            F.count("*").alias("n"),
            round_half_up(F.sum("l_quantity").cast("double"), 2).alias(
                "sum_qty"
            ),
        )


_register_csv_roundtrip()


def _register_orc_roundtrip() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "orc_roundtrip_agg",
        oracle="""
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(sum(o_totalprice_cents) AS BIGINT) AS total_cents
        FROM (
          SELECT o_orderpriority,
                 CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                      AS BIGINT) AS o_totalprice_cents
          FROM orders
        )
        GROUP BY o_orderpriority
        """,
    )
    def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ORC source/sink roundtrip — the columnar-format twin of
        csv_roundtrip_agg: stage two orders columns (price pre-quantized
        to integer cents so the staged file carries only exact types)
        through ORC write + read, then aggregate; the oracle runs the
        same aggregate on the original parquet, so the roundtrip must be
        lossless. Exercises Spark's second columnar format end-to-end —
        at 100 TB the ORC path matters for interop with Hive-era lakes,
        and it inherits the same predicate-pushdown/column-pruning
        contract as parquet. Same staging discipline as
        csv_roundtrip_agg: fixed per-sf dir, exclusive flock, eager
        localCheckpoint under the lock."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        o = table(spark, sf_dir, "orders").select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice").cast("double") * 100 + 0.5)
            .cast("bigint")
            .alias("o_totalprice_cents"),
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_orcrt_{tag}")
        data_dir = os.path.join(root, "data")
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                o.write.mode("overwrite").orc(data_dir)
                back = spark.read.orc(data_dir).localCheckpoint(eager=True)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice_cents").cast("bigint").alias("total_cents"),
        )


_register_orc_roundtrip()


def _register_jsonl_roundtrip() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "jsonl_roundtrip_agg",
        oracle=r"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS total_tokens,
               md5(string_agg(text_hash, '' ORDER BY doc_id ASC))
                 AS corpus_hash
        FROM (
          SELECT doc_id, lang, md5(text) AS text_hash,
                 len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 t -> t <> '')) AS n_toks
          FROM documents
        )
        GROUP BY lang
        """,
    )
    def jsonl_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """JSON-lines source/sink roundtrip — the interchange format of
        every pretraining corpus pipeline (one JSON doc per line, the
        WebText/C4/RedPajama convention). The documents table stages
        through .write.json + .read.json and the rolled-up per-language
        aggregate INCLUDES an order-insensitive corpus hash (md5 of the
        doc-id-ordered per-doc text md5s), so the oracle proves the
        text survived JSON escaping byte-exactly — newlines, quotes,
        unicode and all — not just that row counts match. Same staging
        discipline as csv/orc_roundtrip_agg: fixed per-sf dir,
        exclusive flock, eager localCheckpoint under the lock.

        100 TB shape: JSONL is splittable by line, so the read stays
        partition-parallel; schema is explicit on read (never
        inferSchema over a corpus — that is a full extra scan)."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        d = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_jsonrt_{tag}")
        data_dir = os.path.join(root, "data")
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                d.write.mode("overwrite").json(data_dir)
                back = spark.read.schema(
                    "doc_id bigint, lang string, text string"
                ).json(data_dir).localCheckpoint(eager=True)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        from tiny_etl_multiproc_bigdata_spark.functions.text import (
            tokenize_words_nonempty,
        )

        per_doc = back.select(
            "doc_id",
            "lang",
            F.md5("text").alias("text_hash"),
            F.size(tokenize_words_nonempty("text")).alias("n_toks"),
        )
        return per_doc.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("doc_id"), F.col("text_hash"))
                            )
                        ),
                        lambda s: s["text_hash"],
                    ),
                    "",
                )
            ).alias("corpus_hash"),
        )


_register_jsonl_roundtrip()


def _register_partitioned_roundtrip() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "partitioned_write_prune_agg",
        oracle="""
        SELECT source,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE lang = 'en'
        GROUP BY source
        """,
    )
    def partitioned_write_prune_agg(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Hive-style partitioned write + partition-PRUNED read: stage
        the documents table partitioned by ``lang``, read it back with
        a lang filter that Spark satisfies by LISTING only the matching
        directory (PartitionFilters in the scan — the pruning plan
        shape is pinned in tests/test_partitioned_write.py), and aggregate. The oracle aggregates the
        original parquet — the roundtrip plus pruning must be lossless.
        At 100 TB this is the difference between scanning one language
        partition and the whole corpus; the same mechanics drive
        date-partitioned ingest layouts. Same staging discipline as
        csv/orc roundtrips (fixed per-sf dir, flock, eager snapshot
        under the lock)."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        d = table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars", "lang"
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_partrt_{tag}")
        data_dir = os.path.join(root, "data")
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                d.write.mode("overwrite").partitionBy("lang").parquet(
                    data_dir
                )
                # explicit schema (r11 empty-input audit): an EMPTY
                # write leaves no files to infer from — production
                # readers of a partitioned table carry the schema
                back = (
                    spark.read.schema(d.schema)
                    .parquet(data_dir)
                    .where(F.col("lang") == "en")
                    .localCheckpoint(eager=True)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.groupBy("source").agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )


_register_partitioned_roundtrip()


def _register_schema_evolution() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "schema_evolution_merge_read",
        oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                               THEN o_orderpriority END) AS BIGINT)
                 AS n_with_priority,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        """,
    )
    def schema_evolution_merge_read(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Schema evolution across file vintages: an old writer emitted
        orders WITHOUT o_orderpriority (pre-1996 partition), a new
        writer added the column — ``mergeSchema`` reconciles both
        vintages in one scan, old files surfacing NULL for the added
        column. The aggregate counts exactly the new-vintage rows as
        priority-bearing, so the oracle (a CASE over the original
        table) pins both the union semantics and the NULL-fill.
        The lake-reality primitive every long-lived 100 TB table needs:
        schema change must not require rewriting history. Same staging
        discipline as the csv/orc/partitioned roundtrips."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        o = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_evort_{tag}")
        data_dir = os.path.join(root, "data")
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                old = o.where(F.col("o_orderdate") < "1996-01-01").select(
                    "o_orderkey", "cents"
                )
                new = o.where(F.col("o_orderdate") >= "1996-01-01").select(
                    "o_orderkey", "cents", "o_orderpriority"
                )
                old.write.mode("overwrite").parquet(f"{data_dir}/v=1")
                new.write.mode("overwrite").parquet(f"{data_dir}/v=2")
                back = (
                    spark.read.option("mergeSchema", "true")
                    .parquet(data_dir)
                    .localCheckpoint(eager=True)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("o_orderpriority").cast("bigint").alias(
                "n_with_priority"
            ),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )


_register_schema_evolution()


def _register_dynamic_partition_overwrite() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "dynamic_partition_overwrite",
        oracle="""
        SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT)
                 AS total_chars
        FROM documents WHERE lang IS DISTINCT FROM 'en' GROUP BY lang
        UNION ALL
        SELECT lang, count(*), CAST(sum(n_chars) AS BIGINT)
        FROM documents WHERE lang = 'en' AND doc_id % 2 = 0 GROUP BY lang
        """,
        # IS DISTINCT FROM, not <>: a NULL lang is a REAL partition
        # (Spark writes it as __HIVE_DEFAULT_PARTITION__) that the en
        # overwrite leaves untouched — plain <> would drop it from the
        # oracle under 3VL (r11 NULL-parity audit class)
    )
    def dynamic_partition_overwrite(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Dynamic partition overwrite (INSERT OVERWRITE partition
        semantics): stage the corpus partitioned by lang, then
        overwrite with a frame containing ONLY a reduced English slice
        under partitionOverwriteMode=dynamic — the write must replace
        exactly the partitions present in the incoming data (en) and
        leave every other language's files untouched. Static mode
        would have wiped the whole table; the readback aggregation
        proves both halves: en reflects the second write, the rest
        still reflect the first. This is the daily-reload primitive of
        date-partitioned lakes (reload today's partition, keep
        history). Same staging discipline as the sibling roundtrips
        (per-sf dir, flock, eager snapshot under the lock); the
        session-level mode flag is restored in a finally.

        100 TB shape: the overwrite's cost is proportional to the
        REPLACED partitions only — commit is a directory swap per
        touched partition, never a table rewrite."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        d = table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars", "lang"
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_dynpo_{tag}")
        data_dir = os.path.join(root, "data")
        os.makedirs(root, exist_ok=True)
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            try:
                d.write.mode("overwrite").partitionBy("lang").parquet(
                    data_dir
                )
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                en_half = d.filter(
                    (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
                )
                en_half.write.mode("overwrite").partitionBy("lang").parquet(
                    data_dir
                )
                # explicit schema (r11 empty-input audit): an EMPTY
                # staging write leaves nothing to infer from
                back = (
                    spark.read.schema(d.schema)
                    .parquet(data_dir)
                    .localCheckpoint(eager=True)
                )
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.groupBy("lang").agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )


_register_dynamic_partition_overwrite()


def _register_csv_permissive() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "csv_permissive_corrupt_records",
        oracle="""
        WITH base AS (
          SELECT doc_id, source, n_chars FROM documents WHERE doc_id < 200
        )
        SELECT CAST(count(CASE WHEN doc_id % 13 <> 0 THEN 1 END) AS BIGINT)
                 AS n_good,
               CAST(count(CASE WHEN doc_id % 13 = 0 THEN 1 END) AS BIGINT)
                 AS n_corrupt,
               CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN n_chars END)
                    AS BIGINT) AS good_chars,
               CAST(count(DISTINCT CASE WHEN doc_id % 13 <> 0 THEN
                      CASE WHEN doc_id % 7 = 0 THEN source || ';ok'
                           ELSE source END END) AS BIGINT)
                 AS n_distinct_sources
        FROM base
        """,
    )
    def csv_permissive_corrupt_records(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """CSV parser compliance under PERMISSIVE mode (the reference's
        CSV loader domain, hardened): the staged file mixes clean rows,
        QUOTED fields containing the delimiter (every 7th doc's source
        becomes "src;ok" — must parse as one field), and rows with an
        extra unquoted field (every 13th doc — schema mismatch). The
        read must parse the quoted delimiters correctly, capture each
        malformed line in `_corrupt_record` WITHOUT nulling the whole
        batch or aborting (FAILFAST's behavior), and account for every
        line exactly once: n_good + n_corrupt == lines written. The
        oracle never parses the CSV — it derives the expected outcome
        from the same rules applied relationally, so a parser
        divergence (swallowed lines, mis-split quotes) cannot cancel
        out.

        100 TB shape: CSV parsing is per-split streaming; PERMISSIVE
        keeps one bad upstream line from failing a 10-hour ingest —
        the corrupt column IS the dead-letter queue."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        rows = (
            table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .select("doc_id", "source", "n_chars")
            .collect()
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_csvperm_{tag}")
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, "data.csv")
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                with open(path, "w") as f:
                    for r in sorted(rows, key=lambda r: r["doc_id"]):
                        src = (
                            f'"{r["source"]};ok"'
                            if r["doc_id"] % 7 == 0
                            else r["source"]
                        )
                        line = f'{r["doc_id"]};{src};{r["n_chars"]}'
                        if r["doc_id"] % 13 == 0:
                            line += ";EXTRA"
                        f.write(line + "\n")
                back = (
                    spark.read.schema(
                        "doc_id long, source string, n_chars long, "
                        "_corrupt_record string"
                    )
                    .option("sep", ";")
                    .option("mode", "PERMISSIVE")
                    .option("columnNameOfCorruptRecord", "_corrupt_record")
                    .csv(path)
                    .localCheckpoint(eager=True)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        good = F.col("_corrupt_record").isNull()
        # count_if, not sum(when): the oracle's count(CASE) is 0 over
        # an empty file while sum is NULL (r11 empty-input audit)
        return back.agg(
            F.count_if(good).cast("bigint").alias("n_good"),
            F.count_if(~good).cast("bigint").alias("n_corrupt"),
            F.sum(F.when(good, F.col("n_chars"))).cast("bigint").alias(
                "good_chars"
            ),
            F.count_distinct(
                F.when(good, F.col("source"))
            )
            .cast("bigint")
            .alias("n_distinct_sources"),
        )


_register_csv_permissive()


def _register_federated_union() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "federated_union_agg",
        oracle="""
        SELECT lang,
               CAST(3 * count(*) AS BIGINT) AS n_rows,
               CAST(3 * sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
        """,
    )
    def federated_union_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Multi-format federation: the same table staged as parquet,
        CSV and JSONL, read back through three format-specific readers
        and unioned BY NAME (each format surfaces columns in its own
        order — positional union would silently misalign) into one
        aggregation. This is the lake reality the reference's
        one-format loaders never face: vendor drops arrive as CSV,
        streams land as JSONL, curated zones are parquet, and the
        query layer must treat them as one relation. The oracle states
        the invariant directly: three lossless copies triple every
        count exactly.

        100 TB shape: each leg scans with its own reader
        (pruning/pushdown quality differs per format — parquet prunes,
        CSV cannot; that asymmetry is inherent) and the union is
        plan-level, no materialized concatenation; partial aggregation
        folds per leg before the shared shuffle."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        d = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_fedun_{tag}")
        os.makedirs(root, exist_ok=True)
        pq, csvd, jl = (os.path.join(root, x) for x in ("pq", "csv", "jl"))
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                d.write.mode("overwrite").parquet(pq)
                d.select("lang", "n_chars", "doc_id").write.mode(
                    "overwrite"
                ).option("header", True).csv(csvd)
                d.select("n_chars", "doc_id", "lang").write.mode(
                    "overwrite"
                ).json(jl)
                a = spark.read.schema(d.schema).parquet(pq)
                # explicit schemas (r11 empty-input audit): CSV/JSON
                # legs of an empty federation have no rows (or even no
                # header files) to infer from
                b = spark.read.option("header", True).schema(
                    "lang string, n_chars bigint, doc_id bigint"
                ).csv(csvd)
                c = spark.read.schema(
                    "n_chars bigint, doc_id bigint, lang string"
                ).json(jl)
                back = (
                    a.unionByName(
                        b.select(
                            F.col("doc_id").cast("long"),
                            "lang",
                            F.col("n_chars").cast("long"),
                        )
                    )
                    .unionByName(
                        c.select(
                            F.col("doc_id").cast("long"),
                            "lang",
                            F.col("n_chars").cast("long"),
                        )
                    )
                    .localCheckpoint(eager=True)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )


_register_federated_union()


def _register_nested_field_pruning() -> None:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import register

    @register(
        "nested_field_pruning_agg",
        oracle="""
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderpriority
        """,
    )
    def nested_field_pruning_agg(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Nested-schema column pruning: stage orders with the payload
        folded into a STRUCT (meta.priority, meta.money.cents — the
        shape every event envelope and API dump arrives in), read back
        selecting only two LEAVES, and aggregate. Correctness is the
        roundtrip; the 100 TB property is that Spark's schema pruning
        pushes the leaf selection INTO the parquet scan (ReadSchema
        carries the pruned struct, not the whole envelope — pinned in
        tests/test_partitioned_write.py::test_nested_leaf_pruning), so
        a 2-leaf query over a 50-field envelope reads 2 columns. The
        oracle aggregates the flat original — the fold/unfold must be
        lossless.

        100 TB shape: leaf-level I/O plus map-side combine; without
        nested pruning the scan would materialize the full struct per
        row — the usual envelope tax this entry exists to refuse."""
        import fcntl
        import hashlib
        import os
        import tempfile

        from tiny_etl_multiproc_bigdata_spark.catalog import table

        o = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.struct(
                F.col("o_orderpriority").alias("priority"),
                F.struct(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                    .cast("bigint")
                    .alias("cents"),
                    F.col("o_orderstatus").alias("status"),
                ).alias("money"),
                F.col("o_orderdate").alias("odate"),
                F.col("o_custkey").alias("custkey"),
            ).alias("meta"),
        )
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(tempfile.gettempdir(), f"spark_nested_{tag}")
        data_dir = os.path.join(root, "data")
        os.makedirs(root, exist_ok=True)
        with open(root + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                o.write.mode("overwrite").parquet(data_dir)
                back = (
                    spark.read.parquet(data_dir)
                    .select(
                        F.col("meta.priority").alias("priority"),
                        F.col("meta.money.cents").alias("cents"),
                    )
                    .localCheckpoint(eager=True)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return back.groupBy("priority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )


_register_nested_field_pruning()
