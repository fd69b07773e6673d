"""Structured Streaming surface: the continuous analog of the
reference's bounded-queue dataflow (pipline.py:120-145), with the
event-time semantics the reference lacks (SURVEY §2.9)."""
