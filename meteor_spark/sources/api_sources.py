"""API-backed extractors: kafka, mongodb, couchdb, elastic, cassandra,
redshift, bigtable, gcs, github, shield, grafana, metabase, superset,
tableau, redash, optimus, bigquery.

Shared design (SURVEY.md §2.3): each extractor is a traversal over a
service client's catalog surface producing asset rows; the client is a
small injectable object (constructor arg or `client` attribute), exactly
how the reference tests these plugins (mocked clients/servers — e.g.
grafana_test.go, metabase_test.go). The real network clients
(kafka-python, pymongo, google-cloud-*) are not in this container, so
connecting without an injected client raises a clear error; traversal
logic, exclusion predicates, URN construction, asset shapes, and lineage
mining are all real and tested.

Results land in spark.createDataFrame rows -> the unified ASSET_SCHEMA.
Catalog surfaces are small (thousands of entities); the heavy data-side
computations (profiles, usage) run distributed elsewhere.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from meteor_spark.functions.tables import extract_table_names
from meteor_spark.model.urn import dashboard_urn, job_urn, table_urn, topic_urn, user_urn
from meteor_spark.plugins_base import Extractor, Field
from meteor_spark.registry import register_extractor
from meteor_spark.sources.base import assets_df, column_dict


class ClientError(RuntimeError):
    def __init__(self, name: str):
        super().__init__(
            f"{name}: no client injected and the client library is not available "
            "in this environment; pass client= for tests or install the connector"
        )


class _ApiExtractor(Extractor):
    def __init__(self, client: Any = None) -> None:
        super().__init__()
        self.client = client

    def _client(self):
        if self.client is None:
            raise ClientError(type(self).__name__)
        return self.client


@register_extractor("kafka", "Topic metadata from a Kafka cluster")
class KafkaExtractor(_ApiExtractor):
    """reference: kafka/kafka.go:89-136 — ReadPartitions grouped by topic;
    skips __consumer_offsets and _schemas (kafka.go:25-28)."""

    CONFIG = {"broker": Field(required=True, type=str), "label": Field(default=None, type=str)}
    EXCLUDED = ("__consumer_offsets", "_schemas")

    def extract(self, spark: SparkSession) -> DataFrame:
        # client contract: partitions() -> iterable of (topic, partition_id)
        parts = list(self._client().partitions())
        counts: dict[str, int] = {}
        for topic, _pid in parts:
            if topic in self.EXCLUDED:
                continue
            counts[topic] = counts.get(topic, 0) + 1
        host = self.config["label"] or self.config["broker"]
        rows = [
            {
                "resource": {
                    "urn": topic_urn("kafka", host, t),
                    "name": t,
                    "service": "kafka",
                    "type": "topic",
                    "url": None,
                    "description": None,
                },
                "asset_type": "Topic",
                "topic_profile": {"throughput": None, "number_of_partitions": n},
            }
            for t, n in sorted(counts.items())
        ]
        return assets_df(spark, rows)


@register_extractor("mongodb", "Collection metadata from MongoDB")
class MongoExtractor(_ApiExtractor):
    """reference: mongodb/mongodb.go:90-186 — databases -> collections
    (sorted for determinism, :114-116), EstimatedDocumentCount ->
    TableProfile.TotalRows (:138-156); system.* skipped (:27-29)."""

    CONFIG = {"connection_url": Field(required=True, type=str)}
    EXCLUDED_PREFIX = "system."
    EXCLUDED_DBS = ("admin", "config", "local")

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        host = self.config["connection_url"].split("://")[-1].split("/")[0].split("@")[-1]
        rows = []
        for db in sorted(c.list_database_names()):
            if db in self.EXCLUDED_DBS:
                continue
            for coll in sorted(c.list_collection_names(db)):
                if coll.startswith(self.EXCLUDED_PREFIX):
                    continue
                rows.append(
                    {
                        "resource": {
                            "urn": table_urn("mongodb", host, db, coll),
                            "name": coll,
                            "service": "mongodb",
                            "type": "table",
                            "url": None,
                            "description": None,
                        },
                        "asset_type": "Table",
                        "profile": {"total_rows": int(c.estimated_document_count(db, coll))},
                    }
                )
        return assets_df(spark, rows)


@register_extractor("couchdb", "Database metadata from CouchDB")
class CouchdbExtractor(_ApiExtractor):
    """reference: couchdb/couchdb.go:90-186 — AllDBs -> AllDocs; columns
    inferred from doc field types, skipping _id/_rev (:155-170)."""

    CONFIG = {"connection_url": Field(required=True, type=str)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        host = self.config["connection_url"].split("://")[-1].split("/")[0].split("@")[-1]
        rows = []
        for db in sorted(c.all_dbs()):
            fields: dict[str, str] = {}
            for doc in c.all_docs(db):
                for k, v in doc.items():
                    if k in ("_id", "_rev"):
                        continue
                    fields.setdefault(k, type(v).__name__)
            rows.append(
                {
                    "resource": {
                        "urn": table_urn("couchdb", host, host, db),
                        "name": db,
                        "service": "couchdb",
                        "type": "table",
                        "url": None,
                        "description": None,
                    },
                    "asset_type": "Table",
                    "schema": [column_dict(name=k, data_type=t) for k, t in sorted(fields.items())],
                }
            )
        return assets_df(spark, rows)


@register_extractor("elastic", "Index metadata from Elasticsearch")
class ElasticExtractor(_ApiExtractor):
    """reference: elastic/elastic.go:91-169 — per-index mapping properties
    -> columns (:150-168), doc count from search hits (:119-131)."""

    CONFIG = {"host": Field(required=True, type=str)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        rows = []
        for index in sorted(c.indices()):
            mapping = c.mapping(index)  # {field: type}
            rows.append(
                {
                    "resource": {
                        "urn": f"{self.config['host']}/{index}",
                        "name": index,
                        "service": "elasticsearch",
                        "type": "table",
                        "url": None,
                        "description": None,
                    },
                    "asset_type": "Table",
                    "schema": [column_dict(name=k, data_type=t) for k, t in sorted(mapping.items())],
                    "profile": {"total_rows": int(c.doc_count(index))},
                }
            )
        return assets_df(spark, rows)


@register_extractor("cassandra", "Table metadata from Cassandra system_schema")
class CassandraExtractor(_ApiExtractor):
    """reference: cassandra/cassandra.go:111-213 — system_schema.keyspaces
    -> tables -> columns; system keyspaces excluded (:27-33)."""

    CONFIG = {"host": Field(required=True, type=str), "user_id": Field(default=None), "password": Field(default=None)}
    EXCLUDED = ("system", "system_auth", "system_schema", "system_distributed", "system_traces")

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        rows = []
        for ks in sorted(c.keyspaces()):
            if ks in self.EXCLUDED:
                continue
            for tbl in sorted(c.tables(ks)):
                cols = c.columns(ks, tbl)  # [(name, type)]
                rows.append(
                    {
                        "resource": {
                            "urn": table_urn("cassandra", self.config["host"], ks, tbl),
                            "name": tbl,
                            "service": "cassandra",
                            "type": "table",
                            "url": None,
                            "description": None,
                        },
                        "asset_type": "Table",
                        "schema": [column_dict(name=n, data_type=t) for n, t in sorted(cols)],
                    }
                )
        return assets_df(spark, rows)


@register_extractor("redshift", "Table metadata via the Redshift Data API")
class RedshiftExtractor(_ApiExtractor):
    """reference: redshift/redshift.go:104-242 — Data API ListDatabases ->
    ListTables -> DescribeTable (not JDBC)."""

    CONFIG = {"cluster_id": Field(required=True, type=str), "db_user": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        rows = []
        for db in sorted(c.list_databases()):
            for tbl in sorted(c.list_tables(db)):
                cols = c.describe_table(db, tbl)  # [(name, type, nullable)]
                rows.append(
                    {
                        "resource": {
                            "urn": table_urn("redshift", self.config["cluster_id"], db, tbl),
                            "name": tbl,
                            "service": "redshift",
                            "type": "table",
                            "url": None,
                            "description": None,
                        },
                        "asset_type": "Table",
                        "schema": [
                            column_dict(name=n, data_type=t, is_nullable=bool(nl)) for n, t, nl in sorted(cols)
                        ],
                    }
                )
        return assets_df(spark, rows)


@register_extractor("bigtable", "Table metadata from Bigtable instances")
class BigtableExtractor(_ApiExtractor):
    """reference: bigtable/bigtable.go:93-158 — instances -> tables ->
    column-family info into properties."""

    CONFIG = {"project_id": Field(required=True, type=str)}

    def extract(self, spark: SparkSession) -> DataFrame:
        import json

        c = self._client()
        rows = []
        for inst in sorted(c.instances()):
            for tbl in sorted(c.tables(inst)):
                fams = c.column_families(inst, tbl)
                rows.append(
                    {
                        "resource": {
                            "urn": table_urn("bigtable", self.config["project_id"], inst, tbl),
                            "name": tbl,
                            "service": "bigtable",
                            "type": "table",
                            "url": None,
                            "description": None,
                        },
                        "asset_type": "Table",
                        "properties": {
                            "tags": None,
                            "labels": None,
                            "attributes": json.dumps({"column_families": sorted(fams)}),
                        },
                    }
                )
        return assets_df(spark, rows)


@register_extractor("gcs", "Bucket + blob metadata from Google Cloud Storage")
class GcsExtractor(_ApiExtractor):
    """reference: gcs/gcs.go:100-192 — buckets iterator, optional blob
    listing per bucket (extract_blob config)."""

    CONFIG = {"project_id": Field(required=True, type=str), "extract_blob": Field(default=False)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        pid = self.config["project_id"]
        rows = []
        for b in sorted(c.buckets(), key=lambda x: x["name"]):
            blobs = None
            if self.config["extract_blob"]:
                blobs = [
                    {
                        "urn": f"{pid}/{b['name']}/{bl['name']}",
                        "name": bl["name"],
                        "source": "gcs",
                        "size": int(bl.get("size", 0)),
                        "delete_time": None,
                        "expire_time": None,
                    }
                    for bl in sorted(c.blobs(b["name"]), key=lambda x: x["name"])
                ]
            rows.append(
                {
                    "resource": {
                        "urn": f"gcs::{pid}/{b['name']}",
                        "name": b["name"],
                        "service": "gcs",
                        "type": "bucket",
                        "url": None,
                        "description": None,
                    },
                    "asset_type": "Bucket",
                    "blobs": blobs,
                }
            )
        return assets_df(spark, rows)


@register_extractor("github", "User metadata from a GitHub org")
class GithubExtractor(_ApiExtractor):
    """reference: github/github.go:73-98 — org ListMembers -> Users.Get."""

    CONFIG = {"org": Field(required=True, type=str), "token": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        rows = []
        for login in sorted(c.members(self.config["org"])):
            u = c.user(login)
            rows.append(
                {
                    "resource": {
                        "urn": user_urn("github", u.get("email") or login),
                        "name": login,
                        "service": "github",
                        "type": "user",
                        "url": u.get("url"),
                        "description": None,
                    },
                    "asset_type": "User",
                    "user_info": {
                        "email": u.get("email"),
                        "username": login,
                        "first_name": None,
                        "last_name": None,
                        "full_name": u.get("name"),
                        "display_name": u.get("name"),
                        "title": None,
                        "status": None,
                        "manager_email": None,
                    },
                }
            )
        return assets_df(spark, rows)


@register_extractor("shield", "User + membership metadata from Shield")
class ShieldExtractor(_ApiExtractor):
    """reference: shield/shield.go:71-119 — ListUsers -> role/group per user."""

    CONFIG = {"host": Field(required=True, type=str)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        rows = []
        for u in sorted(c.users(), key=lambda x: x["email"]):
            rows.append(
                {
                    "resource": {
                        "urn": user_urn("shield", u["email"]),
                        "name": u.get("name"),
                        "service": "shield",
                        "type": "user",
                        "url": None,
                        "description": None,
                    },
                    "asset_type": "User",
                    "user_info": {
                        "email": u["email"],
                        "username": u.get("name"),
                        "first_name": None,
                        "last_name": None,
                        "full_name": u.get("name"),
                        "display_name": u.get("name"),
                        "title": None,
                        "status": None,
                        "manager_email": None,
                    },
                    "memberships": [
                        {"group_urn": m["group"], "role": list(m.get("roles", []))}
                        for m in u.get("memberships", [])
                    ],
                }
            )
        return assets_df(spark, rows)


def _dashboard_rows(service: str, host: str, dashboards: list[dict]) -> list[dict]:
    """Shared Dashboard+Charts asset shape (dashboard.pb.go:26,134)."""
    rows = []
    for d in dashboards:
        durn = dashboard_urn(service, host, str(d["id"]))
        charts = [
            {
                "urn": f"{durn}/{c.get('id', i)}",
                "name": c.get("name"),
                "type": c.get("type"),
                "source": service,
                "description": c.get("description"),
                "url": c.get("url"),
                "raw_query": c.get("raw_query"),
                "data_source": str(c.get("data_source") or ""),
                "dashboard_urn": durn,
                "dashboard_source": service,
            }
            for i, c in enumerate(d.get("charts", []))
        ]
        rows.append(
            {
                "resource": {
                    "urn": durn,
                    "name": d.get("name"),
                    "service": service,
                    "type": "dashboard",
                    "url": d.get("url"),
                    "description": d.get("description"),
                },
                "asset_type": "Dashboard",
                "charts": charts or None,
            }
        )
    return rows


@register_extractor("grafana", "Dashboard metadata from Grafana")
class GrafanaExtractor(_ApiExtractor):
    """reference: grafana/grafana.go:78-135 — search dashboards -> details;
    panel RawQuery from first target (:117-135)."""

    CONFIG = {"base_url": Field(required=True, type=str), "api_key": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        host = self.config["base_url"].split("://")[-1]
        return assets_df(spark, _dashboard_rows("grafana", host, c.dashboards()))


@register_extractor("superset", "Dashboard metadata from Superset")
class SupersetExtractor(_ApiExtractor):
    """reference: superset/superset.go:95-130."""

    CONFIG = {"host": Field(required=True, type=str), "username": Field(default=None), "password": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        return assets_df(spark, _dashboard_rows("superset", self.config["host"], c.dashboards()))


@register_extractor("redash", "Dashboard metadata from Redash")
class RedashExtractor(_ApiExtractor):
    """reference: redash/redash.go:82-110 — dashboards only, charts nil."""

    CONFIG = {"base_url": Field(required=True, type=str), "api_key": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        host = self.config["base_url"].split("://")[-1]
        ds = [{**d, "charts": []} for d in c.dashboards()]
        return assets_df(spark, _dashboard_rows("redash", host, ds))


@register_extractor("metabase", "Dashboard metadata + lineage from Metabase")
class MetabaseExtractor(_ApiExtractor):
    """reference: metabase/metabase.go:88-245 — dashboards -> cards ->
    charts; upstream lineage from source tables OR parsing native-query
    SQL (:188-245); per-engine URN mapping (:267-329)."""

    CONFIG = {"host": Field(required=True, type=str), "username": Field(default=None), "password": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        host = self.config["host"]
        # materialize ONCE: a second dashboards() call would re-issue
        # the API traversal, and a generator-returning client would
        # come back exhausted — zip() empty, all lineage silently lost
        ds = list(c.dashboards())
        rows = _dashboard_rows("metabase", host, ds)
        for row, d in zip(rows, ds):
            upstreams: list[dict] = []
            seen: set[str] = set()
            for card in d.get("charts", []):
                for t in self._card_upstreams(card):
                    if t not in seen:  # dedup-union (metabase.go:247-265)
                        seen.add(t)
                        upstreams.append(
                            {"urn": t, "name": t.rsplit("/", 1)[-1], "service": card.get("engine", "postgres"),
                             "type": "table", "url": None, "description": None}
                        )
            if upstreams:
                row["lineage"] = {"upstreams": upstreams, "downstreams": None}
        return assets_df(spark, rows)

    @staticmethod
    def _card_upstreams(card: dict) -> list[str]:
        engine = card.get("engine", "postgres")
        db = card.get("database", "db")
        host = card.get("db_host", "host")
        if card.get("source_table"):
            return [table_urn(engine, host, db, card["source_table"])]
        if card.get("raw_query"):
            return [
                table_urn(engine, host, db, t.rsplit(".", 1)[-1])
                for t in extract_table_names(card["raw_query"])
            ]
        return []


@register_extractor("tableau", "Workbook metadata + lineage from Tableau")
class TableauExtractor(_ApiExtractor):
    """reference: tableau/tableau.go:109-136 — GraphQL projects ->
    workbooks; lineage from UpstreamTables."""

    CONFIG = {"host": Field(required=True, type=str), "sitename": Field(default=None)}

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        wbs = list(c.workbooks())  # one client call; generator-safe (see metabase)
        rows = _dashboard_rows("tableau", self.config["host"], wbs)
        for row, wb in zip(rows, wbs):
            ups = [
                {"urn": t, "name": t.rsplit("/", 1)[-1], "service": "tableau", "type": "table",
                 "url": None, "description": None}
                for t in wb.get("upstream_tables", [])
            ]
            if ups:
                row["lineage"] = {"upstreams": ups, "downstreams": None}
        return assets_df(spark, rows)


@register_extractor("optimus", "Job metadata + lineage from Optimus")
class OptimusExtractor(_ApiExtractor):
    """reference: optimus/optimus.go:76-263 — projects -> namespaces ->
    jobs; upstreams from dependencies, downstream from destination; URN
    remap bigquery://p:d.t -> table URN (:244-263)."""

    CONFIG = {"host": Field(required=True, type=str)}

    @staticmethod
    def _bq_urn(resource: str) -> str:
        # "bigquery://project:dataset.table" -> bigquery::project/dataset/table
        body = resource.split("://", 1)[-1]
        project, rest = body.split(":", 1)
        dataset, table = rest.split(".", 1)
        return table_urn("bigquery", project, dataset, table)

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        host = self.config["host"]
        rows = []
        for j in sorted(c.jobs(), key=lambda x: x["name"]):
            ups = [
                {"urn": self._bq_urn(d), "name": d, "service": "bigquery", "type": "table",
                 "url": None, "description": None}
                for d in j.get("dependencies", [])
            ]
            downs = (
                [{"urn": self._bq_urn(j["destination"]), "name": j["destination"], "service": "bigquery",
                  "type": "table", "url": None, "description": None}]
                if j.get("destination")
                else []
            )
            rows.append(
                {
                    "resource": {
                        "urn": job_urn("optimus", host, j["name"]),
                        "name": j["name"],
                        "service": "optimus",
                        "type": "job",
                        "url": None,
                        "description": j.get("description"),
                    },
                    "asset_type": "Job",
                    "lineage": {"upstreams": ups or None, "downstreams": downs or None},
                    "ownership": (
                        [{"urn": j["owner"], "name": j["owner"], "role": "owner", "email": j["owner"]}]
                        if j.get("owner")
                        else None
                    ),
                }
            )
        return assets_df(spark, rows)


@register_extractor("bigquery", "Dataset/table metadata from BigQuery")
class BigQueryExtractor(_ApiExtractor):
    """reference: bigquery/bigquery.go — datasets -> tables -> columns,
    preview, profile, usage. The catalog walk runs through the injected
    client; data-side profiling reuses operators.profile on a DataFrame
    read through the spark-bigquery connector in production."""

    CONFIG = {
        "project_id": Field(required=True, type=str),
        "max_preview_rows": Field(default=30, type=int),  # bigquery.go:37
        "include_column_profile": Field(default=False),  # bigquery.go:36
    }

    def extract(self, spark: SparkSession) -> DataFrame:
        c = self._client()
        pid = self.config["project_id"]
        rows = []
        for ds in sorted(c.datasets()):
            for tbl in sorted(c.tables(ds)):
                meta = c.table_metadata(ds, tbl)  # {columns: [(name,type,nullable,desc)], num_rows}
                rows.append(
                    {
                        "resource": {
                            "urn": table_urn("bigquery", pid, ds, tbl),
                            "name": tbl,
                            "service": "bigquery",
                            "type": "table",
                            "url": None,
                            "description": meta.get("description"),
                        },
                        "asset_type": "Table",
                        "schema": [
                            column_dict(name=n, data_type=t, is_nullable=bool(nl), description=d)
                            for n, t, nl, d in sorted(meta.get("columns", []))
                        ],
                        "profile": {"total_rows": int(meta.get("num_rows", 0))},
                    }
                )
        return assets_df(spark, rows)
