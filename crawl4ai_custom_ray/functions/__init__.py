"""Training-data / extraction functions: regex extraction, dedup,
similarity search, text statistics, chunkers."""
