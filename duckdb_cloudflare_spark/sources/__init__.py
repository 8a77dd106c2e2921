"""Federated sources: pure-Python clients + PySpark DataSource implementations
for the reference's four remote table-function families (Common Crawl CDX,
Wayback Machine CDX, Cloudflare D1, R2 SQL)."""
