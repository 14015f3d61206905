"""Catalog: declared-schema validation fails fast on drift.

The reference errors when catalog metadata disagrees with storage
(ObjStoreCatalogueEntryReader); here registration validates the parquet
footer against DECLARED_SCHEMAS.
"""

import os

import pytest
from pyspark.sql import functions as F

from pysparkdb.catalog import Catalog


def test_register_validates_missing_column(spark, sf_dir, tmp_path):
    bad = spark.read.parquet(f"{sf_dir}/nation.parquet").drop("n_name")
    path = str(tmp_path / "nation.parquet")
    bad.write.parquet(path)
    cat = Catalog(spark, str(tmp_path))
    with pytest.raises(ValueError, match="missing declared columns"):
        cat.register("nation", path)


def test_register_validates_type_drift(spark, sf_dir, tmp_path):
    bad = spark.read.parquet(f"{sf_dir}/nation.parquet").withColumn(
        "n_name", F.lit(1).cast("long")
    )
    path = str(tmp_path / "nation.parquet")
    bad.write.parquet(path)
    cat = Catalog(spark, str(tmp_path))
    with pytest.raises(ValueError, match="declared StringType"):
        cat.register("nation", path)


def test_register_all_skips_absent_tables(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path)).register_all()
    assert cat.tables == {}


def test_table_lookup_error_names_known_tables(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    cat.register("region", os.path.join(sf_dir, "region.parquet"))
    with pytest.raises(KeyError, match="region"):
        cat.table("no_such_table")
