"""Operators: reconciliation (reference UC#1/UC#2) + LLM-pipeline extensions."""
