"""Object-store sink configuration — the encrypted, cross-account S3
surface of the reference (A15/A16/A25), expressed as the `fs.s3a.*`
Hadoop configuration Spark executors use to write directly to the
store (no data through the driver — the reference's server-side
pattern, /root/reference/backup.sh:119-120).

Local runs don't talk to S3; these builders are pure config dicts, unit
tested, and applied with `apply_sink_conf(spark, conf)` when a real
bucket is the target.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def encrypted_sink_conf(kms_key_id: str | None = None) -> dict[str, str]:
    """SSE-KMS server-side encryption on the write path (the reference's
    `--sse aws:kms --sse-kms-key-id $KEY`, /root/reference/backup.sh:77,
    169, 220; s3v4 signature backup.sh:205)."""
    conf = {
        "fs.s3a.connection.ssl.enabled": "true",
        "fs.s3a.signing-algorithm": "AWS4SignerType",
    }
    if kms_key_id:
        conf["fs.s3a.server-side-encryption-algorithm"] = "SSE-KMS"
        conf["fs.s3a.server-side-encryption.key"] = kms_key_id
    else:
        conf["fs.s3a.server-side-encryption-algorithm"] = "AES256"
    return conf


def cross_account_conf(role_arn: str, session_name: str = "snapshot-sink") -> dict[str, str]:
    """Assume-role credentials for a backups account (the reference's
    generated `[profile backup] role_arn=…
    credential_source=Ec2InstanceMetadata`,
    /root/reference/backup.sh:79-90, toggled by USE_BACKUPS_ACCOUNT)."""
    return {
        "fs.s3a.aws.credentials.provider": "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider",
        "fs.s3a.assumed.role.arn": role_arn,
        "fs.s3a.assumed.role.session.name": session_name,
        "fs.s3a.assumed.role.credentials.provider": "com.amazonaws.auth.InstanceProfileCredentialsProvider",
    }


def token_auth_conf(token: str, expiry_epoch_s: int) -> dict[str, str]:
    """Short-lived token auth placeholder (the reference's 15-minute IAM
    DB auth token, /root/reference/psql-backups-iam-auth.sh:119-124):
    session credentials with an expiry the caller refreshes."""
    return {
        "fs.s3a.aws.credentials.provider": "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
        "fs.s3a.session.token": token,
        "sink.token.expiry-epoch-s": str(expiry_epoch_s),
    }


def apply_sink_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    for k, v in conf.items():
        spark.sparkContext._jsc.hadoopConfiguration().set(k, v)
