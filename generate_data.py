#!/usr/bin/env python
"""Root-level synthesis entry (reference-compatible surface: generate_data.py)."""

from llm_qat_tpu.cli.generate_data import main

if __name__ == "__main__":
    main()
