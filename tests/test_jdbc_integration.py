"""Live JDBC round-trip integration test (r05 verdict item 9).

Closes the K2 options-level gap (reference
``public/lion_parcell_bonus_test_stg.py:262-287``: pandas ``to_sql``
chunked replace-load into Postgres) with a REAL database round-trip —
when the environment provides one. The test needs two things the
air-gapped sandbox lacks:

1. a Postgres JDBC driver jar — pointed at by ``SPARK_PG_JDBC_JAR``
   (Spark never bundles vendor drivers, and the sandbox has no
   network to fetch one);
2. a Postgres server — either a DSN in ``SPARK_PG_URL``
   (``jdbc:postgresql://host:port/db?user=...``), or local
   ``initdb``/``pg_ctl`` binaries, in which case the fixture boots a
   THROWAWAY cluster in tmp_path on a free port and tears it down.

Both present → full write(replace, batched)/read-back equality check,
including the truncate-reload second write (K1 semantics) and a
partitioned parallel read. Either missing → pytest.skip with the
precise reason, so the suite stays green in-sandbox and a real user
pointing the engine at a warehouse gets the seam exercised.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import time

import pytest

JAR = os.environ.get("SPARK_PG_JDBC_JAR")
DSN = os.environ.get("SPARK_PG_URL")


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """The JDBC seam exercised against a REAL database in-sandbox:
    Spark bundles Derby (for the Hive metastore), so the embedded
    driver is already on the shared session's classpath — the
    reader/writer builders run the genuine ``format("jdbc")`` path
    (driver load, dialect type mapping, batched inserts, read-back)
    with no external service. Postgres-dialect quirks are the
    remaining delta, covered by the conditional test below when a
    driver jar + server exist."""
    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.sources.jdbc import jdbc_reader, jdbc_replace_writer

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    drv = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).cast("string").alias("val"),
    )
    jdbc_replace_writer(df, url, "it_derby", batch_size=64, **drv).save()
    got = jdbc_reader(spark, url, "it_derby", **drv).load()
    assert got.count() == 500
    assert got.agg(F.sum("k")).first()[0] == 499 * 500 // 2

    # second replace-load never appends/duplicates (K1 semantics;
    # Derby lacks TRUNCATE-via-JDBC-option support in Spark's dialect,
    # so drop truncate and let overwrite recreate)
    w = jdbc_replace_writer(df.filter("k < 10"), url, "it_derby", **drv)
    w.option("truncate", "false").save()
    assert jdbc_reader(spark, url, "it_derby", **drv).load().count() == 10

    # partitioned parallel read + pushdown-subquery form (S1)
    jdbc_replace_writer(df, url, "it_derby", **drv).option(
        "truncate", "false"
    ).save()
    par = jdbc_reader(
        spark, url, "it_derby",
        partition_column="k", lower_bound=0, upper_bound=500, num_partitions=4,
        **drv,
    ).load()
    assert par.rdd.getNumPartitions() == 4 and par.count() == 500
    # quoted identifiers: Spark's writer quotes column names, and
    # Derby (like the SQL standard) folds UNQUOTED identifiers to
    # uppercase — the exact dialect quirk this seam test exists for
    sub = jdbc_reader(
        spark, url, '(select "k", "val" from it_derby where "grp" = 3) t', **drv
    ).load()
    assert sub.count() == df.filter("grp = 3").count()


needs_pg_jar = pytest.mark.skipif(
    JAR is None or not os.path.exists(JAR),
    reason="no Postgres JDBC driver jar (set SPARK_PG_JDBC_JAR); "
    "options-level coverage lives in tests/test_jdbc.py and the "
    "embedded-Derby round-trip above runs unconditionally",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def pg_url(tmp_path_factory):
    """A live Postgres DSN: $SPARK_PG_URL if set, else a throwaway
    local cluster via initdb/pg_ctl (skipped if neither exists)."""
    if DSN:
        yield DSN
        return
    initdb, pg_ctl = shutil.which("initdb"), shutil.which("pg_ctl")
    if not initdb or not pg_ctl:
        pytest.skip("no $SPARK_PG_URL and no local initdb/pg_ctl")
    data = str(tmp_path_factory.mktemp("pgdata"))
    subprocess.run(
        [initdb, "-D", data, "-U", "spark", "--auth=trust"],
        check=True,
        capture_output=True,
    )
    port = _free_port()
    sock_dir = str(tmp_path_factory.mktemp("pgsock"))
    subprocess.run(
        [
            pg_ctl, "-D", data, "-w", "-t", "30",
            "-o", f"-p {port} -k {sock_dir} -h 127.0.0.1",
            "-l", os.path.join(data, "log"), "start",
        ],
        check=True,
        capture_output=True,
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", port), timeout=1):
                    break
            except OSError:
                time.sleep(0.3)
        yield f"jdbc:postgresql://127.0.0.1:{port}/postgres?user=spark"
    finally:
        subprocess.run(
            [pg_ctl, "-D", data, "-m", "immediate", "stop"],
            capture_output=True,
        )


@pytest.fixture(scope="module")
def pg_spark(pg_url):
    """A session with the driver jar on the classpath (the shared test
    session can't add jars post-start, so this one is its own)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc-integration")
        .config("spark.jars", JAR)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@needs_pg_jar
def test_jdbc_replace_roundtrip_and_truncate_reload(pg_spark, pg_url):
    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.sources.jdbc import jdbc_reader, jdbc_replace_writer

    df = pg_spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    # chunked replace-load (the reference's to_sql(chunksize=10_000,
    # if_exists='replace') analog: batchsize + mode(overwrite))
    jdbc_replace_writer(df, pg_url, "it_roundtrip", batch_size=100).save()
    got = jdbc_reader(pg_spark, pg_url, "it_roundtrip").load()
    assert got.count() == 1000
    assert got.agg(F.sum("k")).first()[0] == 999 * 1000 // 2

    # truncate-reload: second write replaces, never appends/duplicates
    jdbc_replace_writer(df.filter("k < 10"), pg_url, "it_roundtrip").save()
    assert jdbc_reader(pg_spark, pg_url, "it_roundtrip").load().count() == 10

    # partitioned parallel read splits the key range across tasks
    jdbc_replace_writer(df, pg_url, "it_roundtrip").save()
    par = jdbc_reader(
        pg_spark, pg_url, "it_roundtrip",
        partition_column="k", lower_bound=0, upper_bound=1000, num_partitions=4,
    ).load()
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 1000

    # pushdown subquery form (the reference's projection extract, S1)
    sub = jdbc_reader(
        pg_spark, pg_url, "(select k, val from it_roundtrip where grp = 3) t"
    ).load()
    assert sub.columns == ["k", "val"]
    assert sub.count() == df.filter("grp = 3").count()
