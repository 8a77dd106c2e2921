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
spills to a 0600-permission JSON file on every create/drop, and ``get_secret``
falls back to that file on an in-memory miss. This is the same tradeoff
DuckDB itself makes for ``CREATE PERSISTENT SECRET`` (on-disk
~/.duckdb/stored_secrets), and it is what lets attached views carry only the
secret NAME — no plaintext token in view options, query plans, or the Spark
UI — with DROP SECRET revoking access at the next scan. On a multi-host
cluster the spill file must live on shared storage (point
$SPARK_GRAFT_SECRET_FILE at it) or secrets be provided by env vars on each
host; single-host local mode needs no setup.

Spill-file hygiene (the reference keeps secrets in memory; DuckDB's
persistent store lives under the HOME dir — we follow that, not /tmp):

- default location is ``$XDG_CACHE_HOME/spark_graft/secrets.json`` (or
  ``~/.cache/spark_graft/secrets.json``) inside a 0700 directory we create —
  not a predictable name in the world-writable system temp dir;
- loads open with O_NOFOLLOW and verify the file is a regular file, OWNED by
  this uid, with no group/other permission bits, before trusting a byte of
  it (an attacker-planted file or symlink is ignored, never parsed);
- writes go through mkstemp + os.replace in the same directory (atomic; a
  symlink at the destination is replaced, never followed);
- create/drop are read-MERGE-write of the single mutated entry, so two
  concurrent drivers sharing the default per-uid path no longer clobber each
  other's secrets wholesale;
- secrets created by THIS process are removed from the file at interpreter
  exit (atexit), so a session's secrets don't persist indefinitely — matching
  the reference's non-persistent default as closely as a cross-process file
  can;
- the default-NAME fallback checks environment variables BEFORE the spill
  file, so a stale ``__default_d1`` left by a crashed session can never
  override live CLOUDFLARE_* env credentials. Explicit named lookups still
  consult the spill file (that is the worker-process resolution path for
  ATTACH'd views, which store only the secret name).
"""

from __future__ import annotations

import atexit
import json
import os
import stat as _stat
import tempfile
import warnings
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
    explicit = os.environ.get("SPARK_GRAFT_SECRET_FILE")
    if explicit:
        return explicit
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "spark_graft", "secrets.json")


def _ensure_private_dir(path: str) -> str:
    """Create the spill file's parent with 0700 and return it. If the
    directory pre-exists with loose permissions (and we own it), tighten."""
    d = os.path.dirname(path) or "."
    os.makedirs(d, mode=0o700, exist_ok=True)
    try:
        st = os.stat(d)
        if (
            hasattr(os, "getuid")
            and st.st_uid == os.getuid()
            and st.st_mode & 0o077
        ):
            os.chmod(d, 0o700)
    except OSError:
        pass
    return d


def _read_checked(path: str) -> dict:
    """Parse the spill file ONLY if it is a regular file we own with no
    group/other bits — a planted file or symlink yields {} (never parsed)."""
    flags = os.O_RDONLY | getattr(os, "O_NOFOLLOW", 0)
    try:
        fd = os.open(path, flags)
    except OSError:
        return {}
    try:
        st = os.fstat(fd)
        if not _stat.S_ISREG(st.st_mode):
            return {}
        if hasattr(os, "getuid"):
            # POSIX only: Windows' emulated st_mode reports 0o666 for every
            # file (no POSIX permission model), so the bit check would
            # reject ALL spill files there; getuid's absence marks the
            # platforms where these checks are meaningless.
            if st.st_uid != os.getuid():
                warnings.warn(
                    f"ignoring secret spill file not owned by this uid: {path}",
                    stacklevel=3,
                )
                return {}
            if st.st_mode & 0o077:
                warnings.warn(
                    f"ignoring group/other-readable secret spill file: {path}",
                    stacklevel=3,
                )
                return {}
        with os.fdopen(fd, "r") as f:
            fd = -1
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}
    finally:
        if fd >= 0:
            os.close(fd)


def _atomic_write(path: str, data: dict) -> None:
    d = _ensure_private_dir(path)
    fd, tmp = tempfile.mkstemp(prefix=".secrets_", dir=d)  # 0600 by default
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


import contextlib


@contextlib.contextmanager
def _spill_lock(path: str):
    """Exclusive advisory lock on a sibling .lock file for the read+replace
    mutation window. POSIX flock; degrades to a no-op where fcntl is
    unavailable (Windows) — the atomic replace still prevents torn files
    there, only simultaneous-merge loss remains possible."""
    try:
        import fcntl
    except ImportError:
        yield
        return
    try:
        d = _ensure_private_dir(path)
        fd = os.open(os.path.join(d, ".secrets.lock"), os.O_WRONLY | os.O_CREAT, 0o600)
    except OSError:
        yield
        return
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        os.close(fd)  # releases the flock


# (spill_path, name) -> the exact entry THIS process wrote — removed at exit
# so a session's secrets don't outlive it in the shared file. The stored
# entry is compared before deletion: if another live process re-created the
# name since (different values), its CURRENT credential is left alone.
_OWNED: dict[tuple[str, str], dict] = {}


def _cleanup_owned() -> None:
    by_path: dict[str, dict[str, dict]] = {}
    for (path, name), ent in _OWNED.items():
        by_path.setdefault(path, {})[name] = ent
    for path, owned in by_path.items():
        with _spill_lock(path):
            data = _read_checked(path)
            remaining = {
                k: v
                for k, v in data.items()
                if not (k in owned and v == owned[k])
            }
            if len(remaining) != len(data):
                try:
                    if remaining:
                        _atomic_write(path, remaining)
                    else:
                        os.unlink(path)
                except OSError:
                    pass


atexit.register(_cleanup_owned)


class SecretRegistry:
    def __init__(self):
        self._secrets: dict[str, Secret] = {}

    def create_secret(self, name: str, type: str, **values: str) -> Secret:
        if type not in ("d1", "r2_sql"):
            raise ValueError(f"Unknown secret type: {type}")
        secret = Secret(name=name, type=type, values={k.lower(): v for k, v in values.items()})
        self._secrets[name] = secret
        try:
            entry = {"type": secret.type, "values": secret.values}
            self._spill_mutate(name, entry)
            _OWNED[(_spill_path(), name)] = entry
        except OSError:
            # Unwritable location: registry degrades to in-memory (driver-side
            # helpers still work; DataSource scans need env-var credentials).
            pass
        return secret

    def drop_secret(self, name: str) -> None:
        self._secrets.pop(name, None)
        _OWNED.pop((_spill_path(), name), None)
        try:
            self._spill_mutate(name, None)
        except OSError:
            # Revocation MUST take effect cross-process: if the merged rewrite
            # fails, fall back to removing the whole spill file; if even that
            # fails, warn loudly rather than letting workers keep resolving
            # the dropped secret from the stale file.
            try:
                os.unlink(_spill_path())
            except OSError:
                warnings.warn(
                    f"DROP SECRET {name!r}: could not rewrite or remove the "
                    f"spill file {_spill_path()!r}; worker processes may still "
                    "resolve the dropped secret until it is removed",
                    stacklevel=2,
                )

    @staticmethod
    def _spill_mutate(name: str, entry: dict | None) -> None:
        """Read-merge-write a single entry so concurrent drivers sharing the
        default per-uid path only touch their own names. DROP rewrites the
        file, so revocation takes effect at the next scan of any attached
        view. The read+replace pair holds an exclusive flock on a sibling
        lock file (POSIX; a no-op where fcntl is unavailable) so two
        simultaneous mutations serialize instead of the second replace
        discarding the first's entry."""
        path = _spill_path()
        with _spill_lock(path):
            data = _read_checked(path)
            if entry is None:
                if name not in data:
                    return
                del data[name]
            else:
                data[name] = entry
            _atomic_write(path, data)

    def _load_spilled(self, name: str = "", type: str = "d1") -> Secret | None:
        data = _read_checked(_spill_path())
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
        names, then environment variables, then the spill file. Explicit
        in-memory misses consult the spill file (the cross-process path used
        by DataSource workers). Default-name precedence is in-memory > env >
        spill: a live session's CREATE SECRET wins where it was issued, env
        credentials win over anything left on disk by an EARLIER session."""
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
        env = self._from_env(type)
        if env is not None:
            return env
        spilled = self._load_spilled(type=type)
        if spilled is not None:
            return spilled
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
