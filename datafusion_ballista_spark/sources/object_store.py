"""Object-store registration parity (SURVEY §2.2 row 11).

The reference registers per-bucket S3 stores via ``S3Options``
(ballista/core/src/object_store.rs:237-345: access_key_id,
secret_access_key, session_token, region, endpoint, allow_http) and a
``CustomObjectStoreRegistry`` keyed by URL scheme (:122-168). Spark's
equivalent is Hadoop s3a configuration; this module translates the
reference option names to the ``fs.s3a.*`` keys (optionally per-bucket,
mirroring the registry's bucket scoping) and normalizes ``s3://`` URLs to
``s3a://``.

Pure config translation — no network IO, unit-testable offline. At scale
the same confs apply cluster-wide via spark-defaults; per-bucket overrides
(``fs.s3a.bucket.<name>.*``) let one job read two stores with different
credentials, exactly the reference's per-URL store lookup.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import SparkSession

# S3Options field -> s3a conf suffix (object_store.rs:337-349).
_S3_OPTION_KEYS = {
    "access_key_id": "access.key",
    "secret_access_key": "secret.key",
    "session_token": "session.token",
    "region": "endpoint.region",
    "endpoint": "endpoint",
}


def s3_conf(bucket: str | None = None, *, allow_http: bool = False, **options: str) -> dict[str, str]:
    """Translate reference ``S3Options`` to Hadoop s3a conf entries.

    ``bucket=None`` yields global ``fs.s3a.*`` keys; a bucket name yields
    per-bucket ``fs.s3a.bucket.<name>.*`` overrides (the registry scoping,
    object_store.rs:146-168).
    """
    unknown = set(options) - set(_S3_OPTION_KEYS)
    if unknown:
        raise ValueError(
            f"unknown S3 option(s) {sorted(unknown)}; "
            f"supported: {sorted(_S3_OPTION_KEYS)}"
        )
    prefix = f"fs.s3a.bucket.{bucket}." if bucket else "fs.s3a."
    conf = {
        prefix + _S3_OPTION_KEYS[k]: v for k, v in options.items() if v is not None
    }
    if allow_http:
        conf[prefix + "connection.ssl.enabled"] = "false"
        conf[prefix + "path.style.access"] = "true"
    return conf


def register_s3(spark: SparkSession, bucket: str | None = None, **options) -> None:
    """Apply the translated confs to a live session's Hadoop configuration."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3_conf(bucket, **options).items():
        hconf.set(k, v)


# Hadoop 3 ships read-only HTTP filesystems; wiring their impl classes is
# the Spark analogue of the reference's HttpBuilder store for http(s)://
# URLs (object_store.rs:151-157, which also force-allows plain http).
_HTTP_FS_IMPLS = {
    "fs.http.impl": "org.apache.hadoop.fs.http.HttpFileSystem",
    "fs.https.impl": "org.apache.hadoop.fs.http.HttpsFileSystem",
}


def http_conf(*, allow_http: bool = True) -> dict[str, str]:
    """Conf entries enabling http(s):// table URLs — HttpBuilder parity
    (object_store.rs:151-157: any http/https URL gets a store with
    allow_http(true)). ``allow_http=False`` registers only the https
    scheme, the stricter posture the reference offers for S3 endpoints
    via ``s3.allow_http``. Pure config translation; offline-testable
    (the impl classes ship in Spark's bundled hadoop-client)."""
    conf = dict(_HTTP_FS_IMPLS)
    if not allow_http:
        del conf["fs.http.impl"]
    return conf


def register_http(spark: SparkSession, *, allow_http: bool = True) -> None:
    """Apply the HTTP filesystem confs to a live session's Hadoop
    configuration; after this, ``spark.read.csv("https://host/file.csv")``
    resolves through Hadoop's HttpFileSystem exactly as s3a URLs do."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in http_conf(allow_http=allow_http).items():
        hconf.set(k, v)


def normalize_url(url: str) -> str:
    """``s3://`` (reference scheme) -> ``s3a://`` (Hadoop connector scheme);
    everything else passes through."""
    parsed = urlparse(url)
    if parsed.scheme == "s3":
        return "s3a://" + url[len("s3://"):]
    return url
