"""Serving: synthesis engine, streaming chunked decode, HTTP server, TTS
orchestrator."""
