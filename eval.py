#!/usr/bin/env python
"""Root-level evaluation entry (zero-shot tasks + perplexity)."""

from llm_qat_tpu.cli.eval import main

if __name__ == "__main__":
    main()
