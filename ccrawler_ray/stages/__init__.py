"""Stateless map_batches stages of the crawl pipeline."""
