"""YAML configuration — surface-compatible with the reference's conf.yaml.

Reference: `Config` (/root/reference/replibyte/src/config.rs:17-296):
`encryption_key`, `source {connection_uri, transformers, skip, only_tables,
database_subset, compression}`, `datastore {aws|gcp|local_disk}`,
`destination {connection_uri, wipe_database}`.  Env-var interpolation of
`$VAR` values happens at access time (config.rs:513-528); transformer
addressing is `database.table.column` (transformer/mod.rs:60-76).

The Spark engine accepts the same YAML shape; `connection_uri` additionally
understands `parquet://<dir>` (fixture/lake sources) alongside
`postgres://`/`mysql://` (JDBC) — capabilities, not byte formats.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import yaml

_ENV_RE = re.compile(r"^\$([A-Za-z_][A-Za-z0-9_]*)$")


def _env(value):
    """`$VAR` → os.environ['VAR'] at access time (config.rs:513-528)."""
    if isinstance(value, str):
        m = _ENV_RE.match(value)
        if m:
            name = m.group(1)
            if name not in os.environ:
                raise KeyError(f"environment variable not set: ${name}")
            return os.environ[name]
    return value


@dataclass
class ColumnRule:
    name: str
    transformer_name: str
    options: dict = field(default_factory=dict)


@dataclass
class TransformerRule:
    database: str
    table: str
    columns: list[ColumnRule]


@dataclass
class TableRef:
    database: str
    table: str


@dataclass
class SubsetConfig:
    database: str
    table: str
    strategy_name: str  # "random" (reference subset strategy enum)
    strategy_options: dict
    passthrough_tables: list[str] = field(default_factory=list)


@dataclass
class SourceConfig:
    connection_uri: str
    transformers: list[TransformerRule] = field(default_factory=list)
    skip: list[TableRef] = field(default_factory=list)
    only_tables: list[TableRef] = field(default_factory=list)
    database_subset: SubsetConfig | None = None
    compression: bool = True
    # JDBC driver class for raw `jdbc:` connection URIs (embedded engines);
    # postgres://, mysql:// infer their driver from the scheme
    jdbc_driver: str | None = None


@dataclass
class DatastoreConfig:
    dir: str  # local path or s3a://... (Hadoop FS handles the backends)
    # extension over the reference: which table columns to AES-GCM-encrypt
    # at rest when `encryption_key` is set (the reference encrypts whole
    # chunk blobs; column-level keeps scans/pruning working on the rest)
    encrypted_columns: dict[str, list[str]] | None = None


@dataclass
class DestinationConfig:
    connection_uri: str
    wipe_database: bool = True  # reference default (commands/dump.rs:452)
    jdbc_driver: str | None = None


@dataclass
class Config:
    source: SourceConfig | None = None
    datastore: DatastoreConfig | None = None
    destination: DestinationConfig | None = None
    encryption_key: str | None = None

    # -- parsing -----------------------------------------------------------

    @classmethod
    def from_yaml(cls, text: str) -> "Config":
        raw = yaml.safe_load(text) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_file(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_yaml(f.read())

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        src = None
        if "source" in raw:
            s = raw["source"]
            transformers = [
                TransformerRule(
                    database=t.get("database", "public"),
                    table=t["table"],
                    columns=[ColumnRule(c["name"], c["transformer_name"],
                                        c.get("transformer_options") or {})
                             for c in t.get("columns", [])],
                )
                for t in s.get("transformers", [])
            ]
            subset = None
            if s.get("database_subset"):
                ss = s["database_subset"]
                subset = SubsetConfig(
                    database=ss.get("database", "public"),
                    table=ss["table"],
                    strategy_name=ss.get("strategy_name", "random"),
                    strategy_options=ss.get("strategy_options") or {},
                    passthrough_tables=ss.get("passthrough_tables") or [],
                )
            src = SourceConfig(
                connection_uri=_env(s["connection_uri"]),
                transformers=transformers,
                skip=[TableRef(x.get("database", "public"), x["table"])
                      for x in s.get("skip", [])],
                only_tables=[TableRef(x.get("database", "public"), x["table"])
                             for x in s.get("only_tables", [])],
                database_subset=subset,
                compression=s.get("compression", True),
                jdbc_driver=s.get("jdbc_driver"),
            )
            if src.skip and src.only_tables:
                # reference validation (commands/dump.rs:109-128)
                overlap = {t.table for t in src.skip} & {t.table for t in src.only_tables}
                if overlap:
                    raise ValueError(
                        f"tables present in both skip and only_tables: {sorted(overlap)}")
        ds = None
        if "datastore" in raw:
            d = raw["datastore"]
            enc = d.get("encrypted_columns") or None
            if "local_disk" in d:
                ds = DatastoreConfig(dir=_env(d["local_disk"]["dir"]), encrypted_columns=enc)
            elif "dir" in d:
                ds = DatastoreConfig(dir=_env(d["dir"]), encrypted_columns=enc)
            else:
                raise ValueError(f"unsupported datastore config: {sorted(d)}")
        dst = None
        if "destination" in raw:
            t = raw["destination"]
            dst = DestinationConfig(
                connection_uri=_env(t["connection_uri"]),
                wipe_database=t.get("wipe_database", True),
                jdbc_driver=t.get("jdbc_driver"),
            )
        key = _env(raw.get("encryption_key"))
        return cls(source=src, datastore=ds, destination=dst, encryption_key=key)

    def transformer_rules_for(self, table: str,
                              with_options: bool = False) -> dict:
        """{column: transformer_id} for one table (address semantics of
        transformer/mod.rs:60-76, schema part ignored for parquet sources).
        ``with_options=True`` yields {column: (id, options)} — required for
        option-carrying transformers (redacted widths, custom-wasm path)."""
        out: dict = {}
        for rule in (self.source.transformers if self.source else []):
            if rule.table == table:
                for c in rule.columns:
                    out[c.name] = ((c.transformer_name, c.options)
                                   if with_options else c.transformer_name)
        return out
