"""Env-var driven job configuration.

The reference's entire API surface is environment variables
(~30 of them: DB_ENGINE /root/reference/backup.sh:100, SERVICE_NAME
backup.sh:75, ATTEMPTS/TIMEOUT backup.sh:40-41, USE_BACKUPS_ACCOUNT
backup.sh:79, IAM_AUTH_ENABLED /root/reference/psql-backups-iam-auth.sh:119).
This dataclass is the typed equivalent, with the same default-coalesce
semantics as `${VAR-default}` (§2.B B12).
"""

from __future__ import annotations

import os
import secrets
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def clamp_identifier(name: str, limit: int = 29) -> str:
    """Clamp a service name so derived resource ids stay within bounds —
    the reference trims to 29 chars so `<name>-auto-restore-cluster`
    fits RDS's 63-char id limit (/root/reference/psql-backups.sh:56-62)."""
    return name[:limit]


def scratch_password(n_bytes: int = 32) -> str:
    """Random alphanumeric secret for scratch restore targets
    (`openssl rand -base64 32 | tr -cd '[:alnum:]'`,
    /root/reference/psql-backups-iam-auth.sh:175-178)."""
    return "".join(ch for ch in secrets.token_urlsafe(n_bytes) if ch.isalnum())


@dataclass
class JobConfig:
    """Snapshot/verify job configuration (env-overridable)."""

    service_name: str = field(default_factory=lambda: _env("SERVICE_NAME", "datapipeline"))
    env_name: str = field(default_factory=lambda: _env("BACKUP_ENV", "dev"))
    source_format: str = field(default_factory=lambda: _env("SOURCE_FORMAT", "parquet"))  # A6 engine dispatch
    attempts: int = field(default_factory=lambda: int(_env("ATTEMPTS", "9")))
    backoff_s: float = field(default_factory=lambda: float(_env("TIMEOUT", "2")))
    check_in_url: str = field(default_factory=lambda: _env("CHECK_IN_URL", ""))
    tables: tuple[str, ...] | None = None  # None = all catalog tables
    exclude_tables: tuple[str, ...] = ()  # A9's `-N apgcc` schema-filter analogue

    @property
    def clamped_service(self) -> str:
        return clamp_identifier(self.service_name)

    def snapshot_prefix(self) -> str:
        """`s3://bucket/<env>/<service>/` layout analogue
        (/root/reference/backup.sh:220)."""
        return f"{self.env_name}/{self.clamped_service}"
