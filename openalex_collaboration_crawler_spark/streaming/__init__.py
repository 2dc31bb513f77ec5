"""Crawl-loop machinery (frontier, seen-set, politeness) and
event-stream operators."""
