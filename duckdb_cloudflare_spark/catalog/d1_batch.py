"""D1 batched transactions — parity with the reference's custom transaction
manager (/root/reference src/storage/d1_transaction.cpp:17-70,
src/storage/d1_transaction_manager.cpp:11-45, batch HTTP
src/d1_http.cpp:525-547; semantics documented in reference README.md:199-255):

- BEGIN buffers write statements as SQL strings (D1 has no real BEGIN)
- COMMIT sends ONE HTTP POST with the JSON array of statements
- ROLLBACK only discards the unsent buffer (no undo — non-ACID, documented)
- reads inside the transaction execute immediately → NO read-your-writes
"""

from __future__ import annotations

from typing import Any

from duckdb_cloudflare_spark.sources.d1 import D1Client


class D1Batch:
    """``with D1Batch(client) as tx: tx.execute(sql)`` → one batched POST on
    clean exit; exception → buffer discarded (rollback)."""

    def __init__(self, client: D1Client):
        self.client = client
        self._buffer: list[str] = []
        self.results: list[int] = []

    # -- write path (buffered) ---------------------------------------------
    def execute(self, sql: str) -> None:
        self._buffer.append(sql)

    # -- read path (immediate — no read-your-writes) -----------------------
    def query(self, sql: str) -> list[dict[str, Any]]:
        return self.client.query(sql)

    # -- lifecycle ----------------------------------------------------------
    def commit(self) -> list[int]:
        try:
            self.results = self.client.batch(self._buffer)
        finally:
            self._buffer = []
        return self.results

    def rollback(self) -> None:
        self._buffer = []

    def __enter__(self) -> "D1Batch":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
        return False
