"""TEST STUB: serves D1-API-shaped JSON from a local SQLite file.

Response contract mirrored from /root/reference src/d1_http.cpp:328-413:
query  → {"result": [{"results": [...], "success": true, "meta": {...}}], "success": true}
batch  → {"result": [{"success": true, "meta": {...}}, ...], "success": true}
list   → {"result": [{uuid, name, ...}], "success": true}

Picklable (holds only the db path) so it can ride into Spark python workers.
Selected via the ``d1_sqlite_stub`` reader option — never used in production.
"""

from __future__ import annotations

import json
import sqlite3


class D1SqliteStubTransport:
    def __init__(self, db_path: str):
        self.db_path = db_path

    # -- Transport protocol -------------------------------------------------
    def get(self, url: str, headers: dict[str, str] | None = None) -> bytes:
        if url.rstrip("/").endswith("/d1/database"):
            return json.dumps(
                {
                    "result": [
                        {
                            "uuid": "00000000-0000-0000-0000-000000000001",
                            "name": "fixture-db",
                            "created_at": "2025-01-01T00:00:00Z",
                            "version": "production",
                            "file_size": 4096,
                            "num_tables": 5,
                            "running_in_region": "WEUR",
                        }
                    ],
                    "success": True,
                }
            ).encode()
        raise ValueError(f"D1 stub: unexpected GET {url}")

    def post(self, url: str, body: bytes, headers: dict[str, str] | None = None) -> bytes:
        payload = json.loads(body)
        if isinstance(payload, list):  # batch
            results = [self._execute(stmt["sql"], meta_only=True) for stmt in payload]
            return json.dumps({"result": results, "success": True}).encode()
        return json.dumps(
            {"result": [self._execute(payload["sql"])], "success": True}
        ).encode()

    # -- internals ----------------------------------------------------------
    def _execute(self, sql: str, meta_only: bool = False) -> dict:
        con = sqlite3.connect(self.db_path)
        con.row_factory = sqlite3.Row
        try:
            cur = con.execute(sql)
            rows = [
                {
                    k: (list(v) if isinstance(v, (bytes, bytearray)) else v)
                    for k, v in dict(r).items()
                }
                for r in cur.fetchall()
            ]
            con.commit()
            out: dict = {"success": True, "meta": {"changes": con.total_changes}}
            if not meta_only:
                out["results"] = rows
            return out
        except sqlite3.Error as exc:
            return {"success": False, "error": str(exc)}
        finally:
            con.close()
