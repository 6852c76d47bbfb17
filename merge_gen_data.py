#!/usr/bin/env python
"""Root-level chunk merger (reference-compatible surface: merge_gen_data.py)."""

from llm_qat_tpu.cli.generate_data import main

if __name__ == "__main__":
    main(["--merge"])
