"""Secret registry — parity with the reference's CREATE SECRET support
(/root/reference src/d1_secret.cpp, src/r2_secret.cpp):

- types: "d1" (account_id, api_token, database_id/database) and
  "r2_sql" (account_id, api_token, bucket)
- environment-variable fallback (CLOUDFLARE_ACCOUNT_ID / CLOUDFLARE_API_TOKEN /
  CLOUDFLARE_D1_DATABASE_ID — src/d1_functions.cpp:44-62)
- default-name resolution order "d1", "cloudflare", "__default_d1"
  (src/d1_storage.cpp:116-127)
- api_token redaction in any string representation (src/d1_secret.cpp:41)
"""

from __future__ import annotations

import os
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


class SecretRegistry:
    def __init__(self):
        self._secrets: dict[str, Secret] = {}

    def create_secret(self, name: str, type: str, **values: str) -> Secret:
        if type not in ("d1", "r2_sql"):
            raise ValueError(f"Unknown secret type: {type}")
        secret = Secret(name=name, type=type, values={k.lower(): v for k, v in values.items()})
        self._secrets[name] = secret
        return secret

    def drop_secret(self, name: str) -> None:
        self._secrets.pop(name, None)

    def get_secret(self, name: str = "", type: str = "d1") -> Secret:
        """Resolve by name; empty name falls back to the reference's default
        names, then to environment variables."""
        if name:
            if name not in self._secrets:
                raise KeyError(f"Secret '{name}' not found")
            return self._secrets[name]
        for candidate in _DEFAULT_NAMES:
            if candidate in self._secrets and self._secrets[candidate].type == type:
                return self._secrets[candidate]
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
