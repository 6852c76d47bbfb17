#!/usr/bin/env python
"""Root-level QAT training entry (reference-compatible surface: train.py)."""

from llm_qat_tpu.cli.train import main

if __name__ == "__main__":
    main()
