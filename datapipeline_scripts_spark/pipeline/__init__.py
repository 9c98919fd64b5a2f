"""Pipeline / control-plane layer (SURVEY §2.A) — the reference's own
surface re-expressed as Spark batch jobs:

- ``config``   — env-var driven job configuration (the reference's whole
  API is ~30 env vars; /root/reference/backup.sh:40-100).
- ``retrying`` — retry with exponential backoff + poll-until-terminal
  (/root/reference/backup.sh:39-72, 140-164).
- ``snapshot`` — full-database extract to partitioned parquet + manifest
  (pg_dump analogue; /root/reference/backup.sh:210).
- ``verify``   — restore drill: read the snapshot back into a scratch
  warehouse and assert manifest parity (/root/reference/backup.sh:264-375).
"""
