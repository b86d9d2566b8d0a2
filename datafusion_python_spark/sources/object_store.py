"""Object-store registration (ref python/datafusion/object_store.py:21-27,
context.py:595 register_object_store).

The reference registers object_store instances on its runtime; Spark's
equivalent is Hadoop FileSystem configuration — s3a / gs / abfss
connectors read credentials and endpoints from the Hadoop conf, which is
settable at runtime per SparkContext. These classes carry the same
constructor surface as the reference's and know how to emit their Hadoop
config entries. Per-bucket scoping uses Hadoop's
``fs.s3a.bucket.<name>.*`` override form so multiple stores coexist.

On this container no cloud connector jars are loaded, so reads through
these schemes will fail at access time with the standard Hadoop
"No FileSystem for scheme" error — configuration is still applied and
tested; the mapping is the deliverable.
"""

from __future__ import annotations


class LocalFileSystem:
    """ref object_store.py LocalFileSystem — no configuration needed."""

    def __init__(self, prefix: str | None = None) -> None:
        self.prefix = prefix

    def _hadoop_conf(self) -> dict[str, str]:
        return {}


class AmazonS3:
    """ref object_store.py AmazonS3 → Hadoop s3a configs."""

    def __init__(
        self,
        bucket_name: str,
        region: str | None = None,
        access_key_id: str | None = None,
        secret_access_key: str | None = None,
        endpoint: str | None = None,
        allow_http: bool = False,
        imdsv1_fallback: bool = False,
    ) -> None:
        self.bucket_name = bucket_name
        self.region = region
        self.access_key_id = access_key_id
        self.secret_access_key = secret_access_key
        self.endpoint = endpoint
        self.allow_http = allow_http

    def _hadoop_conf(self) -> dict[str, str]:
        scope = f"fs.s3a.bucket.{self.bucket_name}"
        out = {}
        if self.access_key_id:
            out[f"{scope}.access.key"] = self.access_key_id
        if self.secret_access_key:
            out[f"{scope}.secret.key"] = self.secret_access_key
        if self.endpoint:
            out[f"{scope}.endpoint"] = self.endpoint
        if self.region:
            out[f"{scope}.endpoint.region"] = self.region
        if self.allow_http:
            out[f"{scope}.connection.ssl.enabled"] = "false"
        return out


class GoogleCloud:
    """ref object_store.py GoogleCloud → Hadoop gs configs."""

    def __init__(
        self, bucket_name: str, service_account_path: str | None = None
    ) -> None:
        self.bucket_name = bucket_name
        self.service_account_path = service_account_path

    def _hadoop_conf(self) -> dict[str, str]:
        out = {}
        if self.service_account_path:
            out["fs.gs.auth.service.account.json.keyfile"] = self.service_account_path
            out["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
        return out


class MicrosoftAzure:
    """ref object_store.py MicrosoftAzure → Hadoop abfss configs."""

    def __init__(
        self,
        container_name: str,
        account: str | None = None,
        access_key: str | None = None,
        sas_token: str | None = None,
    ) -> None:
        self.container_name = container_name
        self.account = account
        self.access_key = access_key
        self.sas_token = sas_token

    def _hadoop_conf(self) -> dict[str, str]:
        out = {}
        if self.account and self.access_key:
            out[f"fs.azure.account.key.{self.account}.dfs.core.windows.net"] = (
                self.access_key
            )
        if self.account and self.sas_token:
            out["fs.azure.account.auth.type"] = "SAS"
            out[f"fs.azure.sas.token.provider.type.{self.account}"] = "fixed"
        return out


class Http:
    """ref object_store.py Http. Hadoop has no HTTP FileSystem, so
    http(s) paths are fetched driver-side into a local cache at read
    time (see SessionContext._localize_http) — the single-node analogue
    of the reference's range-read HTTP store. The scale path for large
    remote data remains a real object store (S3/GCS/Azure)."""

    def __init__(self, url: str) -> None:
        self.url = url

    def _hadoop_conf(self) -> dict[str, str]:
        return {}  # registration is a no-op; reads localize on demand


def apply_store(spark, store) -> dict[str, str]:
    """Apply a store's Hadoop configs to the live SparkContext; returns
    what was set (runtime-settable: new FileSystem instances pick the
    values up on first access)."""
    conf = store._hadoop_conf()
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return conf
