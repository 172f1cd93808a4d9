"""Per-table CDC configuration (reference parity: tables.json).

The reference loads a JSON array of per-table entries from S3
(``transaction_log_process/transaction_log_util.py:46-53``) with fields
``{db, table, primary_key, format-version, write.merge.mode,
write.update.mode, write.delete.mode, timestamp.fields, precombine_key}``
(``aws-emr-serverless/iceberg/config/tables.json:1-13``).

We keep the same JSON shape but load from any local path / file object /
already-parsed list, validate it, and expose typed access.  The reference's
case-sensitive ``primary_key`` default of ``'ID'``
(``transaction_log_util.py:223``) is preserved as the documented default,
but lookups warn when a table falls back to it.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from typing import Iterable, Mapping

logger = logging.getLogger(__name__)

DEFAULT_PRIMARY_KEY = "ID"


@dataclass(frozen=True)
class TableConfig:
    """Configuration for one sink table."""

    db: str
    table: str
    primary_key: str = DEFAULT_PRIMARY_KEY
    format_version: int = 2
    merge_mode: str = "copy-on-write"
    update_mode: str = "copy-on-write"
    delete_mode: str = "copy-on-write"
    timestamp_fields: tuple[str, ...] = ()
    precombine_key: str = "ts_ms"
    extra: Mapping[str, object] = field(default_factory=dict)

    @property
    def primary_keys(self) -> list[str]:
        """Composite-PK split on commas (reference:
        ``transaction_log_util.py:233-239``)."""
        return [k.strip() for k in self.primary_key.split(",") if k.strip()]

    @property
    def qualified_name(self) -> str:
        return f"{self.db}.{self.table}"


def _entry_to_config(entry: Mapping[str, object]) -> TableConfig:
    known = {
        "db",
        "table",
        "primary_key",
        "format-version",
        "write.merge.mode",
        "write.update.mode",
        "write.delete.mode",
        "timestamp.fields",
        "precombine_key",
    }
    ts_fields = entry.get("timestamp.fields", ()) or ()
    if isinstance(ts_fields, str):
        ts_fields = [ts_fields]
    return TableConfig(
        db=str(entry["db"]),
        table=str(entry["table"]),
        primary_key=str(entry.get("primary_key", DEFAULT_PRIMARY_KEY)),
        format_version=int(entry.get("format-version", 2)),
        merge_mode=str(entry.get("write.merge.mode", "copy-on-write")),
        update_mode=str(entry.get("write.update.mode", "copy-on-write")),
        delete_mode=str(entry.get("write.delete.mode", "copy-on-write")),
        timestamp_fields=tuple(str(f) for f in ts_fields),
        precombine_key=str(entry.get("precombine_key", "ts_ms")),
        extra={k: v for k, v in entry.items() if k not in known},
    )


class TablesConfig:
    """Lookup of :class:`TableConfig` by (db, table)."""

    def __init__(self, entries: Iterable[TableConfig]):
        self._by_name: dict[tuple[str, str], TableConfig] = {}
        for cfg in entries:
            self._by_name[(cfg.db, cfg.table)] = cfg

    def get(self, db: str, table: str) -> TableConfig:
        """Return config for (db, table); a default entry when absent.

        Mirrors the reference fallback (``primary_key='ID'``,
        ``transaction_log_util.py:223,307``) but logs loudly because the
        default is a case-sensitive landmine (SURVEY §8).
        """
        cfg = self._by_name.get((db, table))
        if cfg is None:
            logger.warning(
                "no table config for %s.%s — defaulting primary_key=%r",
                db,
                table,
                DEFAULT_PRIMARY_KEY,
            )
            cfg = TableConfig(db=db, table=table)
        return cfg

    def __len__(self) -> int:
        return len(self._by_name)

    def __iter__(self):
        return iter(self._by_name.values())


def load_tables_config(source) -> TablesConfig:
    """Load table configs from a path, file object, JSON string, or list.

    Same JSON array shape as the reference's
    ``aws-emr-serverless/iceberg/config/tables.json``.
    """
    if isinstance(source, TablesConfig):
        return source
    if isinstance(source, (list, tuple)):
        raw = source
    elif hasattr(source, "read"):
        raw = json.load(source)
    else:
        text = str(source)
        if text.lstrip().startswith("["):
            raw = json.loads(text)
        else:
            with open(text, "r", encoding="utf-8") as fh:
                raw = json.load(fh)
    if not isinstance(raw, list):
        raise ValueError("tables config must be a JSON array of objects")
    return TablesConfig(_entry_to_config(e) for e in raw)
