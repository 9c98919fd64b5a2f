"""The raw SQL entry path: `spark.sql` over registered temp views.

The reference's query capability is delegated to full SQL engines its
users address in SQL (psql/sqlcmd, /root/reference/backup.sh:118-121,
210); this module proves the engine exposes the same modality — ANSI
SQL text in, DataFrame out — not just the DataFrame DSL. Catalyst
compiles both to the same plans, so every scale property (pushdown,
broadcast, partial agg) holds identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query

_SQL = """
WITH seg AS (
  SELECT c.c_mktsegment AS segment,
         o.o_totalprice AS price,
         o.o_orderpriority AS priority
  FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
)
SELECT segment,
       priority,
       count(*) AS n_orders,
       round(avg(price), 2) AS avg_price,
       round(max(price), 2) AS max_price
FROM seg
WHERE priority IN ('1-URGENT', '2-HIGH')
GROUP BY segment, priority
"""


@query(
    "sql_entrypoint",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             o.o_totalprice AS price,
             o.o_orderpriority AS priority
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT segment,
           priority,
           count(*) AS n_orders,
           round(avg(price), 2) AS avg_price,
           round(max(price), 2) AS max_price
    FROM seg
    WHERE priority IN ('1-URGENT', '2-HIGH')
    GROUP BY segment, priority
    """,
)
def sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI SQL in, DataFrame out: register the fixture tables as temp
    views and run a CTE + join + filtered aggregation as SQL text —
    the engine's psql/sqlcmd-equivalent front door. The IN filter
    pushes into the scan and the join/aggregation plan is identical
    to the DSL form (same Catalyst pipeline)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(_SQL)
