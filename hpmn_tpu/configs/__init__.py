"""Canonical configs, one per driver config [B:6-12] (SURVEY.md §5.6).

Reference equivalent: per-dataset hyperparameter dicts/constants inside the
train scripts; here each is an ``ml_collections.ConfigDict`` retrievable by
name, with CLI overrides applied by the train driver.
"""

from .base import base_config, get_config, list_configs

__all__ = ["base_config", "get_config", "list_configs"]
