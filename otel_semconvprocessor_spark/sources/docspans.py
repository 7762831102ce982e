"""Span-shaped derivation over the driver's ``documents`` testdata table.

``__spark_entry__.py``'s DuckDB-oracle gate needs every query to run on the
read-only testdata parquet.  This module derives a deterministic span stream
from ``documents(doc_id, ...)`` with ONE dialect-neutral SQL text
(``DOC_SPANS_SQL``) that executes identically in Spark SQL and DuckDB —
the derivation itself therefore cannot diverge between the engine under test
and the oracle.  The Spark side then feeds the REAL operators
(map-typed attrs -> apply_rules cascade); the DuckDB side uses an
independently hand-written SQL CASE cascade (see __spark_entry__.py).

Family layout (b = doc_id % 100) covers every reference rule
(config.yaml:56-195) incl. the skip-guard and set-if-absent paths:

    [0,10)   http_server_route   server   method + http.route
    [10,28)  http_server_method  server   method only
    [28,33)  grpc_server         server   rpc.system/service/method
    [33,38)  grpc_client         client   rpc.system/service/method
    [38,48)  http_client         client   method; url.template on even doc_id
    [48,58)  db_query            client   db.statement (ParseSQL corpus) + db.system
    [58,63)  db_operation        client   db.operation + collection; db.system on even
    [63,68)  messaging           prod/cons one variant per b -> all 5 messaging rules
             (doc_id parity == b parity, so kind aligns with the legacy ops)
    [68,73)  graphql             server   graphql.operation.type/name
    [73,78)  faas                internal faas.document.collection/operation
    [78,83)  http_path           internal method + url.path (NormalizePath corpus)
    [83,88)  internal_op         internal internal.operation
    [88,91)  preset_opname       server   pre-existing operation.name (skip-guard)
    [91,93)  preset_optype       server   pre-existing operation.type
    [93,100) unmatched           internal no telemetry attrs

Old-vs-new semconv: the http method attr key alternates between
http.request.method / http.method on doc_id parity (FirstNonNil coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["DOC_SPANS_SQL", "doc_spans_sql", "doc_spans", "ATTR_COLS"]

# attr-column name -> attribute key the rule engine sees
ATTR_COLS = {
    "method_new": "http.request.method",
    "method_old": "http.method",
    "http_route": "http.route",
    "url_path": "url.path",
    "url_template": "url.template",
    "db_statement": "db.statement",
    "db_system": "db.system",
    "db_operation": "db.operation",
    "db_collection": "db.collection.name",
    "rpc_system": "rpc.system",
    "rpc_service": "rpc.service",
    "rpc_method": "rpc.method",
    "msg_op_type": "messaging.operation.type",
    "msg_op_name": "messaging.operation.name",
    "msg_operation": "messaging.operation",
    "msg_system": "messaging.system",
    "msg_dest": "messaging.destination.name",
    "gql_type": "graphql.operation.type",
    "gql_name": "graphql.operation.name",
    "faas_coll": "faas.document.collection",
    "faas_op": "faas.document.operation",
    "internal_op": "internal.operation",
    "preset_opname": "operation.name",
    "preset_optype": "operation.type",
}

_DOC_SPANS_TEMPLATE = """
SELECT
  doc_id,
  b,
  CASE
    WHEN b < 33 THEN 'server'
    WHEN b < 63 THEN 'client'
    WHEN b < 68 THEN (CASE WHEN doc_id % 2 = 0 THEN 'producer' ELSE 'consumer' END)
    WHEN b < 73 THEN 'server'
    WHEN b < 88 THEN 'internal'
    WHEN b < 93 THEN 'server'
    ELSE 'internal'
  END AS kind,
  'orig-' || CAST(doc_id % 83 AS STRING) AS name,
  CASE WHEN has_method AND doc_id % 2 = 0 THEN method END AS method_new,
  CASE WHEN has_method AND doc_id % 2 = 1 THEN method END AS method_old,
  CASE WHEN b < 10 THEN (CASE doc_id % 5
      WHEN 0 THEN '/api/users/{userId}'
      WHEN 1 THEN '/api/orders/{orderId}/items'
      WHEN 2 THEN '/products/{id}'
      WHEN 3 THEN '/api/cart'
      ELSE '/health' END) END AS http_route,
  CASE WHEN b >= 78 AND b < 83 THEN (CASE doc_id % 3
      WHEN 0 THEN '/users/' || CAST(doc_id % 90000 AS STRING) || '/profile'
      WHEN 1 THEN '/api/orders/' || substr(md5(CAST(doc_id AS STRING)), 1, 8) || '-'
                 || substr(md5(CAST(doc_id AS STRING)), 9, 4) || '-'
                 || substr(md5(CAST(doc_id AS STRING)), 13, 4) || '-'
                 || substr(md5(CAST(doc_id AS STRING)), 17, 4) || '-'
                 || substr(md5(CAST(doc_id AS STRING)), 21, 12)
      ELSE '/search?q=test' || CAST(doc_id % 50 AS STRING) || '&limit=10' END) END AS url_path,
  CASE WHEN b >= 38 AND b < 48 AND doc_id % 2 = 0 THEN '/api/products/{productId}' END AS url_template,
  CASE WHEN b >= 48 AND b < 58 THEN (CASE doc_id % 6
      WHEN 0 THEN 'SELECT * FROM ' || tbl || ' WHERE id = ' || CAST(doc_id AS STRING)
      WHEN 1 THEN 'INSERT INTO ' || tbl || ' (name, price) VALUES (?, ?)'
      WHEN 2 THEN 'UPDATE ' || tbl || ' SET email = ? WHERE id = ?'
      WHEN 3 THEN 'DELETE FROM ' || tbl || ' WHERE created_at < ?'
      WHEN 4 THEN 'SELECT u.name FROM `schema`.`' || tbl || '` u JOIN orders o ON u.id = o.user_id'
      ELSE 'TRUNCATE TABLE sessions' END) END AS db_statement,
  CASE WHEN (b >= 48 AND b < 58) OR (b >= 58 AND b < 63 AND doc_id % 2 = 0)
       THEN (CASE doc_id % 4 WHEN 0 THEN 'mysql' WHEN 1 THEN 'postgresql' WHEN 2 THEN 'redis' ELSE 'mongodb' END)
  END AS db_system,
  CASE WHEN b >= 58 AND b < 63 THEN (CASE doc_id % 4
      WHEN 0 THEN 'findOne' WHEN 1 THEN 'insertMany' WHEN 2 THEN 'HGET' ELSE 'SETEX' END) END AS db_operation,
  CASE WHEN b >= 58 AND b < 63 THEN tbl END AS db_collection,
  CASE WHEN b >= 28 AND b < 38 THEN 'grpc' END AS rpc_system,
  CASE WHEN b >= 28 AND b < 38 THEN (CASE doc_id % 3
      WHEN 0 THEN 'oteldemo.CartService' WHEN 1 THEN 'oteldemo.ProductCatalogService'
      ELSE 'oteldemo.CurrencyService' END) END AS rpc_service,
  CASE WHEN b >= 28 AND b < 38 THEN (CASE doc_id % 3
      WHEN 0 THEN 'GetCart' WHEN 1 THEN 'ListProducts' ELSE 'Convert' END) END AS rpc_method,
  CASE WHEN b = 63 THEN 'process' END AS msg_op_type,
  CASE WHEN b = 67 THEN 'send' END AS msg_op_name,
  CASE WHEN b = 64 THEN 'publish' WHEN b = 65 THEN 'process' END AS msg_operation,
  CASE WHEN b = 66 THEN 'kafka' END AS msg_system,
  CASE WHEN b >= 63 AND b < 68
       THEN (CASE doc_id % 3 WHEN 0 THEN 'orders' WHEN 1 THEN 'payments' ELSE 'emails' END) END AS msg_dest,
  CASE WHEN b >= 68 AND b < 73 THEN (CASE doc_id % 3 WHEN 2 THEN 'mutation' ELSE 'query' END) END AS gql_type,
  CASE WHEN b >= 68 AND b < 73 THEN (CASE doc_id % 3
      WHEN 0 THEN 'GetProduct' WHEN 1 THEN 'ListCart' ELSE 'AddToCart' END) END AS gql_name,
  CASE WHEN b >= 73 AND b < 78 THEN tbl END AS faas_coll,
  CASE WHEN b >= 73 AND b < 78 THEN (CASE doc_id % 3
      WHEN 0 THEN 'insert' WHEN 1 THEN 'edit' ELSE 'delete' END) END AS faas_op,
  CASE WHEN b >= 83 AND b < 88 THEN (CASE doc_id % 5
      WHEN 0 THEN 'cache.refresh' WHEN 1 THEN 'task.schedule' WHEN 2 THEN 'batch.process'
      WHEN 3 THEN 'queue.drain' ELSE 'config.reload' END) END AS internal_op,
  CASE WHEN b >= 88 AND b < 91 THEN 'preset.operation' END AS preset_opname,
  CASE WHEN b >= 91 AND b < 93 THEN 'preset-type' END AS preset_optype
FROM (
  SELECT doc_id,
    doc_id % 100 AS b,
    (b2 < 28 OR (b2 >= 38 AND b2 < 48) OR (b2 >= 78 AND b2 < 83) OR (b2 >= 88 AND b2 < 93)) AS has_method,
    CASE doc_id % 4 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST' WHEN 2 THEN 'PUT' ELSE 'DELETE' END AS method,
    CASE doc_id % 4 WHEN 0 THEN 'users' WHEN 1 THEN 'orders' WHEN 2 THEN 'products' ELSE 'sessions' END AS tbl
  FROM (SELECT doc_id, doc_id % 100 AS b2 FROM __SRC__)
)
"""


def doc_spans_sql(src: str = "documents") -> str:
    """The dialect-neutral derivation SQL (runs in Spark SQL and DuckDB)."""
    return _DOC_SPANS_TEMPLATE.replace("__SRC__", src)


def doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side: run the shared derivation, then pack the attr columns into
    the ``attrs`` map the real rule engine consumes."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "__docspans_documents"
    )
    wide = spark.sql(doc_spans_sql("__docspans_documents"))
    entries = [
        F.struct(F.lit(key).alias("key"), F.col(col).alias("value"))
        for col, key in ATTR_COLS.items()
    ]
    attrs = F.map_from_entries(F.filter(F.array(*entries), lambda e: e["value"].isNotNull()))
    return wide.select("doc_id", "name", "kind", attrs.alias("attrs"))
