"""Data tier: native prefetching batch loader + numpy fallback."""
