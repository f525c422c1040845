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

    def ctas(self, name: str, query: str, dialect: str = "spark") -> ParquetTable:
        """CREATE TABLE AS SELECT (reference: TableCopier,
        backend/executor.go:151-159)."""
        return self.catalog.create_table(name, self.sql(query, dialect))

    # ----------------------------------------------------------------- DML
    def insert(self, name: str, df: DataFrame) -> None:
        t = self.catalog.table(name)
        t.overwrite(t.read().unionByName(df))

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
