"""Evaluation: objective metrics and statistical gain functions."""
