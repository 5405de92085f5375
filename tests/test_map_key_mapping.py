"""r15: Delta column mapping on struct fields inside MAP KEYS — the
deepest nesting corner of the mapping spec (r14 verdict, missing #5,
previously refused). Renaming struct fields never changes key VALUES,
so key uniqueness is preserved; the scan rebuilds keys via
transform_keys (delta_py._rename_fields)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs2postgres_spark.sources.delta_py import (
    read_delta_py,
    write_delta_column_mapping_fixture,
)


def test_struct_in_map_key_mapping_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, {(10, "a"): 100}),
            (2, {(20, "b"): 200, (21, "c"): 210}),
            (3, None),
        ],
        "k long, m map<struct<kid: long, tag: string>, long>",
    )
    # rename a field INSIDE the map key: logical schema shows the new
    # name, physical files keep col-<id> names at every depth
    write_delta_column_mapping_fixture(
        df, t, renamed={"m.kid": "key_id"}
    )
    got = read_delta_py(spark, t)
    assert got.schema["m"].dataType.keyType.fieldNames() == ["key_id", "tag"]
    rows = {r["k"]: r["m"] for r in got.collect()}
    assert rows[3] is None
    m2 = rows[2]
    keys = sorted((k["key_id"], k["tag"]) for k in m2.keys())
    assert keys == [(20, "b"), (21, "c")]
    assert sorted(m2.values()) == [200, 210]
    # key-side projection works in expressions too
    exploded = (
        got.select("k", F.explode_outer("m").alias("mk", "mv"))
        .select("k", F.col("mk.key_id").alias("kid"), "mv")
    )
    flat = {(r["k"], r["kid"], r["mv"]) for r in exploded.collect()}
    assert flat == {
        (1, 10, 100), (2, 20, 200), (2, 21, 210), (3, None, None),
    }
    # physical file stores NO logical names anywhere in the map type
    import glob as _glob

    from pyspark.sql.types import MapType

    phys = spark.read.parquet(*_glob.glob(f"{t}/*.parquet"))
    mfield = next(
        f for f in phys.schema.fields if isinstance(f.dataType, MapType)
    )
    assert mfield.name.startswith("col-")
    assert all(
        n.startswith("col-") for n in mfield.dataType.keyType.fieldNames()
    )
