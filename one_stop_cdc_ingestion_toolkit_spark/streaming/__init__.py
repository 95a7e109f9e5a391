"""Structured-Streaming ingestion: pipeline runner, schema store, table store."""
