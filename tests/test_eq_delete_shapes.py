"""Round-14: the two 'exotic' Iceberg equality-delete shapes the r13
verdict listed as refusals now READ correctly:

1. NESTED-struct equality ids (spec: equality fields may be any
   primitive field, including struct members) — resolved via the
   schema's dotted paths, null-safe anti-join on the nested column.
2. MIXED column signatures within one (ids, seq) group (delete files
   written under different schemas): each footer-signature group gets
   its own type-consistent scan + anti-join; the union equals one
   mixed join. Rename-evolved delete files resolve by their parquet
   field ids.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcs2postgres_spark.sources.iceberg_py import (
    read_iceberg_py,
    write_iceberg_v2_fixture,
)


def test_nested_struct_equality_delete_reads(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, ("berlin", 10)),
            (2, ("paris", 20)),
            (3, ("berlin", 30)),
            (4, (None, 40)),
        ],
        "k int, addr struct<city string, score int>",
    )
    write_iceberg_v2_fixture(
        df, t, sort_col="k",
        equality_deletes=[({"addr.city": "berlin"}, 2)],
    )
    got = read_iceberg_py(spark, t)
    rows = {r["k"] for r in got.collect()}
    # both berlin rows deleted; NULL city survives (null-safe equality
    # matches only NULL = NULL, and the delete key is 'berlin')
    assert rows == {2, 4}
    # strict-past rule still gates: same delete at seq 1 (== data seq)
    t2 = str(tmp_path / "t2")
    write_iceberg_v2_fixture(
        df, t2, sort_col="k",
        equality_deletes=[({"addr.city": "berlin"}, 1)],
    )
    assert {r["k"] for r in read_iceberg_py(spark, t2).collect()} == {1, 2, 3, 4}


def test_mixed_signature_equality_deletes_read(spark, tmp_path):
    """Two delete files in the SAME (ids, seq) group with different
    footer signatures: one stores the CURRENT column name, one the
    pre-rename name but WITH parquet field ids — each group resolves
    independently (by id where ids exist), and both apply."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gcs2postgres_spark.sources.avro_py import (
        read_avro_file,
        write_avro_file,
    )
    from gcs2postgres_spark.sources.iceberg_py import (
        MANIFEST_ENTRY_SCHEMA_V2,
        _v2_entry,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, f"n{k}") for k in range(6)], "k int, name string"
    )
    write_iceberg_v2_fixture(
        df, t, sort_col="k",
        equality_deletes=[({"k": 1}, 2)],  # current-name delete file
    )
    # hand-add a SECOND delete file at the same (ids, seq) whose column
    # is named differently ("k_old") but carries the parquet FIELD ID
    # of k (id 1 in the fixture's sequential assignment) — the shape a
    # pre-rename writer leaves behind
    ed2 = os.path.join(t, "data", "delete-eq-foreign.parquet")
    field = pa.field(
        "k_old", pa.int32(), metadata={b"PARQUET:field_id": b"1"}
    )
    pq.write_table(
        pa.table([pa.array([3], pa.int32())], schema=pa.schema([field])), ed2
    )
    man = os.path.join(t, "metadata", "manifest-deletes-1.avro")
    _schema, entries = read_avro_file(man)
    entries = list(entries)
    entries.append(_v2_entry(ed2, content=2, seq=2, equality_ids=[1]))
    write_avro_file(man, MANIFEST_ENTRY_SCHEMA_V2, entries, codec="null")
    # fix the manifest length in the manifest list
    mlist = os.path.join(t, "metadata", "snap-1.avro")
    _ls, lrows = read_avro_file(mlist)
    lrows = list(lrows)
    for r in lrows:
        if r["manifest_path"].endswith("manifest-deletes-1.avro"):
            r["manifest_length"] = os.path.getsize(man)
    from gcs2postgres_spark.sources.iceberg_py import MANIFEST_LIST_SCHEMA_V2

    write_avro_file(mlist, MANIFEST_LIST_SCHEMA_V2, lrows, codec="null")

    got = {r["k"] for r in read_iceberg_py(spark, t).collect()}
    assert got == {0, 2, 4, 5}, got  # k=1 (named) AND k=3 (id-resolved) gone


def test_unresolvable_equality_id_still_refuses(spark, tmp_path):
    """Ids under arrays/maps have no stable row path — keep refusing."""
    import pytest

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, ("x", 1))], "k int, addr struct<city string, score int>"
    )
    write_iceberg_v2_fixture(
        df, t, sort_col="k", equality_deletes=[({"k": 99}, 2)]
    )
    # corrupt the delete entry's ids to a nonexistent field id
    from gcs2postgres_spark.sources.avro_py import read_avro_file, write_avro_file
    from gcs2postgres_spark.sources.iceberg_py import MANIFEST_ENTRY_SCHEMA_V2

    man = os.path.join(t, "metadata", "manifest-deletes-1.avro")
    _s, entries = read_avro_file(man)
    entries = list(entries)
    for e in entries:
        if e["data_file"].get("content") == 2:
            e["data_file"]["equality_ids"] = [999]
    write_avro_file(man, MANIFEST_ENTRY_SCHEMA_V2, entries, codec="null")
    with pytest.raises(NotImplementedError, match="field id"):
        read_iceberg_py(spark, t).collect()
