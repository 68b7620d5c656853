"""Referred-tables + Distributed-engine detector pins.

Pinned on the reference's own test queries
(test/sql/clickhouse/parser/TestAstParser.java:34-80):
testReferredTablesDetector and testDistributedTableInfoDetector 1-3.
Expected values are what ReferredTablesDetector.java:17-73 and
DistributedTableInfoDetector.java:12-97 produce on those inputs
(names lowercased by the shared tokenizer — documented divergence).
"""

from sqlfeatureextraction_spark.functions.sqldetect import (
    distributed_cluster_name,
    distributed_local_table,
    referred_tables,
)


def test_referred_tables_reference_query():
    # TestAstParser.java:36 — FROM + RIGHT JOIN operands
    sql = (
        "SELECT t1.a FROM t1 RIGHT JOIN t2 ON t1.id = t2.id LIMIT 1000"
    )
    assert referred_tables(sql) == ["t1", "t2"]


def test_referred_tables_qualified_and_subquery():
    sql = (
        "SELECT * FROM my_db.big b LEFT JOIN "
        "(SELECT id FROM my_db.dim WHERE x IN "
        "(SELECT id FROM other.lkp)) d ON b.id = d.id"
    )
    # subquery operand contributes nothing itself; its inner FROMs do
    assert referred_tables(sql) == ["my_db.big", "my_db.dim", "other.lkp"]


def test_referred_tables_skips_table_functions():
    sql = "SELECT * FROM numbers(10) n JOIN t ON n.number = t.id"
    assert referred_tables(sql) == ["t"]


def test_distributed_detector_reference_case_1():
    # TestAstParser.java:46 — plain Distributed engine DDL
    sql = (
        "CREATE TABLE my_db.my_tbl (date Date, name String) "
        "Engine = Distributed('my_cluster', 'my_db', 'my_tbl_local', "
        "rand())"
    )
    assert distributed_cluster_name(sql) == "my_cluster"
    assert distributed_local_table(sql) == "my_db.my_tbl_local"


def test_distributed_detector_reference_case_2_non_distributed():
    # TestAstParser.java:59 — ReplicatedMergeTree: both probes null
    sql = (
        "CREATE TABLE mydb.mytb (uuid UUID DEFAULT generateUUIDv4(), "
        "cktime DateTime DEFAULT now() COMMENT 'c', openid String) "
        "ENGINE = ReplicatedMergeTree('/clickhouse/mydb/mytb/{shard}',"
        " '{replica}') PARTITION BY toYYYYMM(cktime) "
        "ORDER BY (regtime, appid, openid) "
        "SETTINGS index_granularity = 8192"
    )
    assert distributed_cluster_name(sql) is None
    assert distributed_local_table(sql) is None


def test_distributed_detector_reference_case_3_on_cluster():
    # TestAstParser.java:71 — ON CLUSTER + AS form
    sql = (
        "CREATE TABLE my_db.my_tbl on cluster my_cluster "
        "Engine = Distributed('my_cluster', 'my_db', 'my_tbl_local', "
        "rand()) as my_db.my_tbl_local"
    )
    assert distributed_cluster_name(sql) == "my_cluster"
    assert distributed_local_table(sql) == "my_db.my_tbl_local"


def test_non_create_statement_yields_none():
    assert distributed_cluster_name("SELECT 1") is None
    assert distributed_local_table("SELECT 1") is None
