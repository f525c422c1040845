"""Engine facade — the user-facing entry point (SURVEY.md §7 design).

Wraps a SparkSession with (a) a catalog of versioned parquet tables,
(b) a SQL front door with optional MySQL-dialect normalization
(the reference's DuckBuilder ships SQL text to DuckDB after
transpiling, backend/executor.go:183-219 + transpiler/translate.go:102
— here Catalyst is the engine, so the transpile is a light normalize),
(c) ingest/export (LOAD DATA / COPY parity in sources/), and
(d) DML helpers (INSERT / UPDATE / DELETE / REPLACE) that re-express
the reference's DuckDB DML dispatch (backend/executor.go:162-165,
loaddata REPLACE/IGNORE semantics loaddata.go:131-150) as snapshot
rewrites on versioned tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from myduckserver_spark.catalog import Catalog, ParquetTable
from myduckserver_spark.functions.mysql_compat import translate_mysql
from myduckserver_spark.types import schema_from_mysql


class Engine:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)

    # ------------------------------------------------------------ SQL front
    def sql(self, query: str, dialect: str = "spark") -> DataFrame:
        """Run SQL; dialect='mysql' applies the MySQL→Spark normalizer.

        Registered engine tables are exposed as temp views lazily so
        SQL text can reference them by name (the reference's catalog
        does this inside DuckDB; here the session catalog is the seam).
        """
        if dialect == "mysql":
            query = translate_mysql(query)
        self._refresh_views()
        return self.spark.sql(query)

    def _refresh_views(self) -> None:
        for name in self.catalog.list_tables():
            self.catalog.table(name).read().createOrReplaceTempView(name)

    # ----------------------------------------------------------------- DDL
    def create_table(
        self,
        name: str,
        schema: StructType | list[tuple[str, str]] | dict[str, str],
        rows: list | None = None,
    ) -> ParquetTable:
        if not isinstance(schema, StructType):
            schema = schema_from_mysql(schema)
        df = self.spark.createDataFrame(rows or [], schema)
        return self.catalog.create_table(name, df)

    def drop_table(self, name: str) -> None:
        self.catalog.drop_table(name)
        self.spark.catalog.dropTempView(name)

    # ---------------------------------------------------- ALTER TABLE family
    # (reference: catalog/table.go:222+ add/rename/modify/drop column,
    #  exercised by TestAlterTable main_test.go:2116)
    def alter_add_column(
        self, name: str, col: str, mysql_type: str, default=None
    ) -> None:
        """ALTER TABLE ADD COLUMN (appended at the end — the reference
        ignores column ordering too, catalog/table.go:227)."""
        from myduckserver_spark.types import mysql_to_spark

        dtype, _meta = mysql_to_spark(mysql_type)
        t = self.catalog.table(name)
        t.overwrite(t.read().withColumn(col, F.lit(default).cast(dtype)))

    def alter_drop_column(self, name: str, col: str) -> None:
        t = self.catalog.table(name)
        t.overwrite(t.read().drop(col))

    def alter_rename_column(self, name: str, old: str, new: str) -> None:
        t = self.catalog.table(name)
        t.overwrite(t.read().withColumnRenamed(old, new))

    def alter_modify_column(self, name: str, col: str, mysql_type: str) -> None:
        """MODIFY COLUMN: cast the column to the new type."""
        from myduckserver_spark.types import mysql_to_spark

        dtype, _meta = mysql_to_spark(mysql_type)
        t = self.catalog.table(name)
        t.overwrite(t.read().withColumn(col, F.col(col).cast(dtype)))

    def rename_table(self, old: str, new: str) -> None:
        import os

        os.rename(
            os.path.join(self.catalog.root, old),
            os.path.join(self.catalog.root, new),
        )
        self.spark.catalog.dropTempView(old)

    def ctas(self, name: str, query: str, dialect: str = "spark") -> ParquetTable:
        """CREATE TABLE AS SELECT (reference: TableCopier,
        backend/executor.go:151-159)."""
        return self.catalog.create_table(name, self.sql(query, dialect))

    # ----------------------------------------------------------------- DML
    def insert(self, name: str, df: DataFrame) -> None:
        t = self.catalog.table(name)
        t.overwrite(t.read().unionByName(df))

    def insert_with_defaults(
        self, name: str, df: DataFrame, defaults: dict[str, object] | None = None
    ) -> None:
        """INSERT with missing columns filled from declared defaults
        (reference: column defaults parsed/normalized at
        catalog/type_mapping.go:334-352; TestColumnDefaults :1977)."""
        t = self.catalog.table(name)
        base = t.read()
        defaults = defaults or {}
        out = df
        for field in base.schema.fields:
            if field.name not in out.columns:
                out = out.withColumn(
                    field.name,
                    F.lit(defaults.get(field.name)).cast(field.dataType),
                )
        t.overwrite(base.unionByName(out.select(*base.columns)))

    def insert_auto_increment(
        self, name: str, df: DataFrame, id_col: str
    ) -> None:
        """AUTO_INCREMENT parity (reference implements it as a DuckDB
        SEQUENCE + nextval default, catalog/database.go:159-210): new
        rows get ids starting after the current max. Uses a window
        rank, not monotonically_increasing_id, so ids are dense like
        MySQL's counter."""
        from pyspark.sql import Window as W

        t = self.catalog.table(name)
        base = t.read()
        start = (base.agg(F.max(id_col)).collect()[0][0] or 0) + 1
        id_type = dict(base.dtypes)[id_col]
        order_cols = [c for c in df.columns] or [F.lit(1)]
        numbered = df.withColumn(
            id_col,
            (F.row_number().over(W.orderBy(*order_cols)) + start - 1).cast(id_type),
        )
        t.overwrite(base.unionByName(numbered.select(*base.columns)))

    def insert_checked(
        self, name: str, df: DataFrame, checks: dict[str, Column]
    ) -> None:
        """INSERT with CHECK constraints enforced engine-side (the
        reference enforces checks in the GMS layer, not DuckDB —
        backend/executor.go:110-116). Raises on the first violation."""
        for cname, cond in checks.items():
            bad = df.filter(~cond | cond.isNull()).limit(1).collect()
            if bad:
                raise ValueError(
                    f"CHECK constraint '{cname}' violated by row: {bad[0]}"
                )
        self.insert(name, df)

    def insert_replace(self, name: str, df: DataFrame, pk_cols: list[str]) -> None:
        """INSERT OR REPLACE (MySQL REPLACE INTO): new rows win on PK
        (reference loaddata.go:131-137 → MERGE WHEN MATCHED UPDATE)."""
        t = self.catalog.table(name)
        base = t.read()
        kept = base.join(df.select(*pk_cols).distinct(), pk_cols, "left_anti")
        t.overwrite(kept.unionByName(df.select(*base.columns)))

    def insert_ignore(self, name: str, df: DataFrame, pk_cols: list[str]) -> None:
        """INSERT IGNORE: existing rows win on PK
        (reference loaddata.go:138-143 → MERGE WHEN NOT MATCHED INSERT)."""
        t = self.catalog.table(name)
        base = t.read()
        fresh = df.join(base.select(*pk_cols).distinct(), pk_cols, "left_anti")
        t.overwrite(base.unionByName(fresh.select(*base.columns)))

    def update(self, name: str, condition: Column, assignments: dict[str, Column]) -> int:
        """UPDATE t SET col=expr WHERE cond, as a snapshot rewrite."""
        t = self.catalog.table(name)
        base = t.read()
        n = base.filter(condition).count()
        updated = base.withColumns(
            {
                col: F.when(condition, expr).otherwise(F.col(col))
                for col, expr in assignments.items()
            }
        )
        t.overwrite(updated)
        return n

    def delete(self, name: str, condition: Column) -> int:
        t = self.catalog.table(name)
        base = t.read()
        n = base.filter(condition).count()
        t.overwrite(base.filter(~condition | condition.isNull()))
        return n

    def truncate(self, name: str) -> None:
        t = self.catalog.table(name)
        t.overwrite(t.read().limit(0))
