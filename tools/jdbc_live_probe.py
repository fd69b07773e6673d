"""Live JDBC round-trip probe against Spark's own Thrift server.

The container ships no MySQL driver jar, so the L5/L6 JDBC loaders
(reference loaders/mysql.py:10-135) could historically only be tested
at the DataFrameWriter.jdbc boundary (tests/test_jdbc_sink.py). It DOES
ship hive-jdbc 2.3.10 plus spark-hive-thriftserver, which together
allow a genuine live SQL endpoint inside the test JVM:

  HiveThriftServer2.startWithContext(session)  →  jdbc:hive2://...

against which this probe verifies, end to end over a real socket:

  1. sink DDL executes live — ``jdbc_load`` connects, runs the
     overwrite DROP and CREATE TABLE (type mapping included), and the
     table exists server-side afterwards;
  2. the one break is the DRIVER, not the sink — row insert dies at
     ``HivePreparedStatement.addBatch`` ("Method not supported" in
     hive-jdbc 2.3), the exact batching API the reference's MySQL
     target supports (mysql-connector implements addBatch), so the
     same call succeeds verbatim against the reference's target;
  3. live DML through the same stack — rows inserted via a plain JDBC
     Statement (the non-batch API hive-jdbc does implement);
  4. the Spark JDBC SOURCE is fully live — ``spark.read.jdbc`` round-
     trips schema and values, and a partitionColumn read plans >1
     input partition (the parallel-scan shape a 100 TB ingest uses).

Run standalone (prints one JSON line) or via tests/test_jdbc_live.py.

Requires ``spark.sql.ansi.doubleQuotedIdentifiers=true`` on the server
session: Spark's dialect-default identifier quoting is double quotes,
which Spark SQL otherwise parses as string literals. The Thrift server
is started with ``singleSession=true`` so the probe session's conf is
the served session's conf.
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_probe(port: int | None = None) -> dict:
    import tempfile

    from pyspark.sql import SparkSession

    from tiny_etl_multiproc_bigdata_spark.sinks import jdbc_load

    port = port or _free_port()
    result: dict = {"port": port}

    # Hermetic: a fresh warehouse per run (a leftover
    # spark-warehouse/words_live from a prior run makes CREATE TABLE
    # fail on "location already exists"), and derby artifacts kept out
    # of the repo tree. The explicit derby ConnectionURL matters for
    # SPEED, not just hygiene: with the default (broken) memory: URL
    # the metastore client's init fails and RetryingHMSHandler sleeps
    # ~20s inside EVERY HiveServer2 session close — which Spark's JDBC
    # source pays per scan. A working derby file DB + retry.attempts=1
    # makes closes instant (probe total ~40s instead of ~4min).
    scratch = tempfile.mkdtemp(prefix="jdbc_live_probe_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc-live-probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", f"{scratch}/warehouse")
        .config("spark.hadoop.hive.hmshandler.retry.attempts", "1")
        .config("spark.hadoop.hive.hmshandler.retry.interval", "0s")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={scratch}/metastore_db;create=true",
        )
        .config("hive.server2.thrift.port", str(port))
        .config("spark.sql.hive.thriftServer.singleSession", "true")
        .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
        .getOrCreate()
    )
    # derby reads this JVM system property lazily at first metastore
    # access (first JDBC session open), so setting it here still lands
    # derby.log in the scratch dir instead of the repo root.
    spark.sparkContext._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", f"{scratch}/derby.log"
    )
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
            spark._jsparkSession.sqlContext()
        )
        deadline = time.time() + 90
        up = False
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), timeout=1).close()
                up = True
                break
            except OSError:
                time.sleep(0.5)
        result["server_up"] = up
        if not up:
            return result

        url = f"jdbc:hive2://localhost:{port}/default"
        props = {
            "driver": "org.apache.hive.jdbc.HiveDriver",
            # STRING/INT would map back through the dialect default to
            # TEXT (not a Spark SQL type); VARCHAR survives the
            # round-trip, so the generated CREATE TABLE parses live.
            "createTableColumnTypes": "word VARCHAR(1024), cnt INT",
        }
        df = spark.createDataFrame(
            [("alpha", 3), ("beta", 1), ("gamma", 7)], "word string, cnt int"
        )

        # Past this point any exception must still surface the fields
        # gathered so far (a bare raise would otherwise discard e.g.
        # write/table_exists and misreport as a server failure).
        try:
            # (1)+(2): the sink's own write path, against the live server.
            try:
                jdbc_load(
                    df, url, "words_live", mode="overwrite", n_shards=2, properties=props
                )
                result["write"] = "ok"  # a future batch-capable driver jar
            except Exception as e:  # noqa: BLE001 — probe records, test asserts
                msg = str(e)
                result["write"] = "addBatch-unsupported" if (
                    "addBatch" in msg and "Method not supported" in msg
                ) else f"unexpected: {msg[:400]}"

            # DDL landed server-side even though the insert could not batch.
            result["table_exists"] = bool(
                spark.sql("SHOW TABLES IN default LIKE 'words_live'").count()
            )

            # (3): live DML through the same driver, via the non-batch API —
            # only when the batch write could not land the rows itself
            # (otherwise the reads below would see every row twice).
            if result["write"] != "ok":
                dm = jvm.java.sql.DriverManager
                conn = dm.getConnection(url, "", "")
                try:
                    st = conn.createStatement()
                    st.execute(
                        "INSERT INTO words_live VALUES "
                        "('alpha', 3), ('beta', 1), ('gamma', 7)"
                    )
                    st.close()
                finally:
                    conn.close()

            # (4): the Spark JDBC source, live — plain and partitioned scans.
            read_props = {"driver": "org.apache.hive.jdbc.HiveDriver"}
            got = spark.read.jdbc(url, "words_live", properties=read_props)
            result["read_schema"] = got.schema.simpleString()
            result["read_rows"] = sorted(map(list, got.collect()))

            part = spark.read.jdbc(
                url,
                "words_live",
                column="cnt",
                lowerBound=0,
                upperBound=8,
                numPartitions=2,
                properties=read_props,
            )
            result["partitioned_nparts"] = part.rdd.getNumPartitions()
            result["partitioned_rows"] = sorted(map(list, part.collect()))

            filtered = got.filter("cnt > 2").select("word")
            result["filtered_words"] = sorted(r[0] for r in filtered.collect())
        except Exception as e:  # noqa: BLE001 — keep partial results
            result["error"] = f"{type(e).__name__}: {e}"[:800]
        return result
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    try:
        out = run_probe()
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        out = {"server_up": False, "error": f"{type(e).__name__}: {e}"[:800]}
    print("JDBC_LIVE_PROBE " + json.dumps(out))
    sys.exit(0 if out.get("server_up") else 1)
