"""Landing-zone ingest tests (S4/S5 equivalents)."""

import hashlib
import json
import os

import pytest

from riksdagen_sentences_spark.sources import ingest


def test_fetch_is_gated():
    with pytest.raises(NotImplementedError):
        ingest.fetch_batch(["http://example.org/x"])


def test_landing_to_files(spark, tmp_path):
    meta_dir = tmp_path / "meta"
    text_dir = tmp_path / "texts"
    meta_dir.mkdir()
    text_dir.mkdir()
    rows = []
    for i, url in enumerate(
        ["http://x/d1.pdf", "http://x/d2.pdf", "http://x/d1.pdf"]  # dup
    ):
        h = hashlib.md5(url.encode()).hexdigest()
        rows.append(
            {"url": url, "url_md5": h, "external_id": f"e{i}",
             "mime": "application/pdf", "fetched_at": "2026-01-01",
             "bytes": 10}
        )
        with open(text_dir / f"{h}.txt", "w") as f:
            f.write(f"Extracted text {i} line one.\nLine two of {i}.")
    with open(meta_dir / "metadata.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    files = ingest.landing_to_files(
        spark, str(meta_dir), str(text_dir / "*.txt"), "folketinget",
        "c0", "da",
    )
    got = files.collect()
    assert len(got) == 2  # dup url collapsed by md5(url)
    assert all(r["repo"] == "folketinget" for r in got)
    assert all(r["path"].endswith(".txt") for r in got)
    assert any("line one" in r["content"].lower() for r in got)
