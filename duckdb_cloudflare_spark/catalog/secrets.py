"""Secret registry — parity with the reference's CREATE SECRET support
(/root/reference src/d1_secret.cpp, src/r2_secret.cpp):

- types: "d1" (account_id, api_token, database_id/database) and
  "r2_sql" (account_id, api_token, bucket)
- environment-variable fallback (CLOUDFLARE_ACCOUNT_ID / CLOUDFLARE_API_TOKEN /
  CLOUDFLARE_D1_DATABASE_ID — src/d1_functions.cpp:44-62)
- default-name resolution order "d1", "cloudflare", "__default_d1"
  (src/d1_storage.cpp:116-127)
- api_token redaction in any string representation (src/d1_secret.cpp:41)

Process model: PySpark's Python DataSources run schema()/reader()/read() in
SEPARATE worker Python processes, so a purely in-memory registry is invisible
exactly where scan-bind secret resolution must happen. The registry therefore
spills to a 0600-permission JSON file (path from $SPARK_GRAFT_SECRET_FILE,
default under the system temp dir, keyed by uid) on every create/drop, and
``get_secret`` falls back to that file on an in-memory miss. This is the same
tradeoff DuckDB itself makes for ``CREATE PERSISTENT SECRET`` (on-disk
~/.duckdb/stored_secrets), and it is what lets attached views carry only the
secret NAME — no plaintext token in view options, query plans, or the Spark
UI — with DROP SECRET revoking access at the next scan. On a multi-host
cluster the spill file must live on shared storage (or secrets be provided by
env vars on each host); single-host local mode needs no setup.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field

_REDACTED_KEYS = {"api_token"}
_DEFAULT_NAMES = ("d1", "cloudflare", "__default_d1")


@dataclass
class Secret:
    name: str
    type: str  # "d1" | "r2_sql"
    values: dict[str, str] = field(default_factory=dict)

    def get(self, key: str, default: str = "") -> str:
        return self.values.get(key, default)

    def __repr__(self) -> str:  # redaction
        shown = {k: ("****" if k in _REDACTED_KEYS else v) for k, v in self.values.items()}
        return f"Secret(name={self.name!r}, type={self.type!r}, values={shown!r})"

    __str__ = __repr__


def _spill_path() -> str:
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.environ.get(
        "SPARK_GRAFT_SECRET_FILE",
        os.path.join(tempfile.gettempdir(), f".spark_graft_secrets_{uid}.json"),
    )


class SecretRegistry:
    def __init__(self):
        self._secrets: dict[str, Secret] = {}

    def create_secret(self, name: str, type: str, **values: str) -> Secret:
        if type not in ("d1", "r2_sql"):
            raise ValueError(f"Unknown secret type: {type}")
        secret = Secret(name=name, type=type, values={k.lower(): v for k, v in values.items()})
        self._secrets[name] = secret
        self._save()
        return secret

    def drop_secret(self, name: str) -> None:
        self._secrets.pop(name, None)
        self._save()

    def _save(self) -> None:
        """Spill to the 0600 shared file so DataSource worker processes can
        resolve names at scan-bind; DROP rewrites the file, so revocation
        takes effect at the next scan of any attached view."""
        data = {
            n: {"type": s.type, "values": s.values}
            for n, s in self._secrets.items()
        }
        path = _spill_path()
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
        except OSError:
            # Read-only temp dir: registry degrades to in-memory (driver-side
            # helpers still work; DataSource scans need env-var credentials).
            pass

    def _load_spilled(self, name: str = "", type: str = "d1") -> Secret | None:
        try:
            with open(_spill_path()) as f:
                data = json.load(f)
        except (OSError, ValueError):
            return None
        if name:
            ent = data.get(name)
            if ent is not None:
                return Secret(name=name, type=ent["type"], values=ent["values"])
            return None
        for candidate in _DEFAULT_NAMES:
            ent = data.get(candidate)
            if ent is not None and ent["type"] == type:
                return Secret(name=candidate, type=ent["type"], values=ent["values"])
        return None

    def get_secret(self, name: str = "", type: str = "d1") -> Secret:
        """Resolve by name; empty name falls back to the reference's default
        names, then to environment variables. In-memory misses consult the
        spill file (the cross-process path used by DataSource workers)."""
        if name:
            if name not in self._secrets:
                spilled = self._load_spilled(name)
                if spilled is not None:
                    return spilled
                raise KeyError(f"Secret '{name}' not found")
            return self._secrets[name]
        for candidate in _DEFAULT_NAMES:
            if candidate in self._secrets and self._secrets[candidate].type == type:
                return self._secrets[candidate]
        spilled = self._load_spilled(type=type)
        if spilled is not None:
            return spilled
        env = self._from_env(type)
        if env is not None:
            return env
        raise KeyError(
            f"No secret of type '{type}' found (tried names {list(_DEFAULT_NAMES)} and env vars)"
        )

    @staticmethod
    def _from_env(type: str) -> Secret | None:
        account = os.environ.get("CLOUDFLARE_ACCOUNT_ID", "")
        token = os.environ.get("CLOUDFLARE_API_TOKEN", "")
        if not account or not token:
            return None
        values = {"account_id": account, "api_token": token}
        if type == "d1":
            db = os.environ.get("CLOUDFLARE_D1_DATABASE_ID", "")
            if db:
                values["database_id"] = db
        return Secret(name="__env__", type=type, values=values)

    def list_secrets(self) -> list[Secret]:
        return list(self._secrets.values())


_global_registry: SecretRegistry | None = None


def global_registry() -> SecretRegistry:
    global _global_registry
    if _global_registry is None:
        _global_registry = SecretRegistry()
    return _global_registry


def create_secret(name: str, type: str, **values: str) -> Secret:
    return global_registry().create_secret(name, type, **values)
