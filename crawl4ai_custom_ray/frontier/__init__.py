"""Frontier / scheduler core: URL filters + scorers, the sharded
URL-seen set, robots evaluation, per-host politeness budgeting and the
round-synchronous (BSP) crawl driver loop."""
