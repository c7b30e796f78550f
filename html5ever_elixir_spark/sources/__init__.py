"""Sources: deterministic Common-Crawl-style pages corpora (the
north-rule input shape: url, warc_ts, html, text, lang)."""
