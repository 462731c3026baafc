"""Time-series operators (SURVEY.md §2-B reference read API, §2-C derived
analytics) over the canonical (source, metric, ts, value) series view.

Populated in build-plan step 3."""
