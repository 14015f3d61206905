"""Object-store (s3a://) configuration surface.

The reference's whole identity is scanning S3-compatible object stores —
its AWS client layer (fpdb-aws/src/AWSClient.cpp, aws-config.conf) carries
endpoint/credential/connection settings and S3GetPOp/SelectPOp
(fpdb-executor/src/physical/s3/S3GetPOp.cpp:1-527, SelectPOp.cpp:1-495)
issue the GETs. Spark's equivalent is the hadoop-aws S3A connector: every
``spark.read`` path may be an ``s3a://bucket/prefix`` URI and the
connector is configured entirely through ``fs.s3a.*`` Hadoop confs. This
module packages that conf block the way aws-config.conf does for the
reference, in both forms Spark accepts:

- ``s3a_session_confs(...)`` → ``spark.hadoop.fs.s3a.*`` keys for session
  BUILD time (``get_spark(extra_confs=s3a_session_confs(...))``);
- ``configure_s3a(spark, ...)`` → the same settings applied to a RUNNING
  session via its Hadoop configuration (Spark copies ``spark.hadoop.*``
  into that configuration at startup; afterwards only the Hadoop-level
  object is live, so this is the correct post-start surface).

What is and is not verified in this sandbox (README "Object-store scans"):
conf construction and injection are unit-tested (tests/test_sources.py);
an actual S3/MinIO round-trip needs the hadoop-aws + AWS SDK bundle jars
(NOT shipped with the pip pyspark distribution — add
``spark.jars.packages=org.apache.hadoop:hadoop-aws:<hadoop-version>`` on
a cluster, where it is typically preinstalled) and a reachable endpoint;
``tests/test_sources.py::test_s3a_live_smoke`` runs the live path only
when ``PYSPARKDB_S3_SMOKE=1`` with endpoint/credential env vars set.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Remote filesystem schemes whose existence/scan go through Hadoop's
# FileSystem API rather than os.path (catalog.register_all consults this).
REMOTE_SCHEMES = ("s3a://", "s3://", "gs://", "abfss://", "abfs://",
                  "wasbs://", "hdfs://", "oss://")

_ANON_PROVIDER = "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
_SIMPLE_PROVIDER = "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"


def is_remote_path(path: str) -> bool:
    return path.startswith(REMOTE_SCHEMES)


def s3a_confs(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    region: str | None = None,
    path_style_access: bool | None = None,
    ssl_enabled: bool | None = None,
    anonymous: bool = False,
    credentials_provider: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """``fs.s3a.*`` conf block (Hadoop-level keys, no ``spark.hadoop.``
    prefix) — the aws-config.conf analog.

    - AWS S3 proper: usually just credentials (or nothing — instance
      profile / env-var providers are in the connector's default chain).
    - MinIO / localstack / on-prem S3-compatible stores: pass
      ``endpoint="http://host:9000"``; ``path_style_access`` defaults ON,
      and an EXPLICIT ``http://`` scheme disables SSL to match. A
      scheme-less endpoint (the conventional Hadoop-docs form, e.g.
      ``s3.eu-west-1.amazonaws.com``) leaves the SSL conf UNSET so the
      connector's secure default (TLS on) governs — inferring "no
      https:// prefix → plaintext" would silently downgrade AWS-proper
      endpoints to unencrypted HTTP. Only an explicit scheme sets it.
    - ``anonymous=True`` selects the anonymous provider (public buckets);
      explicit keys select the simple provider; ``credentials_provider``
      overrides either.
    """
    confs: dict[str, str] = {}
    if endpoint is not None:
        confs["fs.s3a.endpoint"] = endpoint
        if path_style_access is None:
            path_style_access = True
        if ssl_enabled is None and endpoint.startswith(("http://", "https://")):
            ssl_enabled = endpoint.startswith("https://")
    if region is not None:
        confs["fs.s3a.endpoint.region"] = region
    if path_style_access is not None:
        confs["fs.s3a.path.style.access"] = str(path_style_access).lower()
    if ssl_enabled is not None:
        confs["fs.s3a.connection.ssl.enabled"] = str(ssl_enabled).lower()
    if access_key is not None:
        confs["fs.s3a.access.key"] = access_key
    if secret_key is not None:
        confs["fs.s3a.secret.key"] = secret_key
    provider = credentials_provider
    if provider is None and anonymous:
        provider = _ANON_PROVIDER
    if provider is None and access_key is not None:
        provider = _SIMPLE_PROVIDER
    if provider is not None:
        confs["fs.s3a.aws.credentials.provider"] = provider
    confs.update(extra or {})
    return confs


def s3a_session_confs(**kwargs) -> dict[str, str]:
    """Same settings as ``s3a_confs`` but keyed ``spark.hadoop.fs.s3a.*``
    for session build time: ``get_spark(extra_confs=s3a_session_confs(
    endpoint=...))``."""
    return {f"spark.hadoop.{k}": v for k, v in s3a_confs(**kwargs).items()}


def configure_s3a(spark: SparkSession, **kwargs) -> dict[str, str]:
    """Apply S3A settings to a RUNNING session's Hadoop configuration and
    return what was set. Safe to call repeatedly (reconfiguring for a
    different endpoint); note Hadoop caches FileSystem instances per
    (scheme, authority), so switching credentials for a bucket already
    touched in this session also needs ``fs.s3a.impl.disable.cache=true``
    in ``extra`` (documented Hadoop behavior, not a connector quirk)."""
    confs = s3a_confs(**kwargs)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in confs.items():
        hconf.set(k, v)
    return confs


def hadoop_list_names(spark: SparkSession, directory: str) -> set:
    """Child basenames of ``directory`` through Hadoop's FileSystem API —
    ONE metadata RPC (a LIST, not per-child HEADs), which is how a remote
    catalog should discover its tables. Missing directory → empty set."""
    from py4j.protocol import Py4JJavaError

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(directory)
    fs = jpath.getFileSystem(hconf)
    try:
        return {st.getPath().getName() for st in fs.listStatus(jpath)}
    except Py4JJavaError as ex:
        # missing directory → empty set, from the LIST's own error rather
        # than a separate exists() probe (which would double the remote
        # metadata round-trips and belie the one-RPC claim above)
        if "FileNotFoundException" in str(ex.java_exception):
            return set()
        raise


def hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through Hadoop's FileSystem API — works for any
    configured scheme (s3a, gs, hdfs, file). The remote-path analog of
    ``os.path.exists`` in catalog.register_all; one metadata RPC, no scan."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return bool(fs.exists(jpath))
