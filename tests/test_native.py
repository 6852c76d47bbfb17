"""Native C++ data-pipeline extension: build, parity with Python json, and
edge cases (escapes, unicode, surrogate pairs)."""

import json
import os

import pytest

from llm_qat_tpu import native


fd = native.get_fastdata()
needs_native = pytest.mark.skipif(fd is None, reason="no C++ toolchain")


@needs_native
def test_reader_parity_with_python_json(tmp_path):
    docs = [
        "plain ascii",
        'quotes " and \\ backslash',
        "newline\nand\ttab",
        "unicode: café 中文",
        "emoji beyond BMP: \U0001f600",
        "control \b\f chars",
        "",
        "trailing space ",
    ]
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps({"text": d}) + "\n")
        f.write("\n")  # blank line is skipped like the python reader
        f.write(json.dumps({"other": 1, "text": "after other key"}) + "\n")

    got = fd.read_jsonl_texts(str(p))
    assert got == docs + ["after other key"]


@needs_native
def test_reader_max_lines(tmp_path):
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(10):
            f.write(json.dumps({"text": str(i)}) + "\n")
    assert fd.read_jsonl_texts(str(p), 3) == ["0", "1", "2"]


@needs_native
def test_reader_ensure_ascii_escapes(tmp_path):
    """json.dumps default ensure_ascii=True writes \\uXXXX — must decode."""
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"text": "café \U0001f600"}) + "\n")
    raw = open(p).read()
    assert "\\u" in raw  # really escaped on disk
    assert fd.read_jsonl_texts(str(p)) == ["café \U0001f600"]


@needs_native
def test_count_lines(tmp_path):
    p = tmp_path / "x.jsonl"
    with open(p, "w") as f:
        for i in range(37):
            f.write(json.dumps({"text": str(i)}) + "\n")
    assert fd.count_lines(str(p)) == 37


@needs_native
def test_reader_error_on_missing_text(tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"nope": 1}) + "\n")
    with pytest.raises(ValueError):
        fd.read_jsonl_texts(str(p))


def test_dataset_uses_reader(tmp_path):
    """data.dataset.read_jsonl_texts agrees with python json regardless of
    which path is active."""
    from llm_qat_tpu.data.dataset import read_jsonl_texts

    p = tmp_path / "d.jsonl"
    docs = ["a", 'b "c"', "ünicode"]
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps({"text": d}) + "\n")
    assert read_jsonl_texts(str(p)) == docs
