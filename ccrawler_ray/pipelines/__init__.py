"""Crawl pipeline: generation loop, admission, checkpoints."""
