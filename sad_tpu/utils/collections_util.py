"""AttrDict (ref: detectron/lib/utils/collections.py) — attribute-style dict
for users porting scripts; sad_tpu's own config is immutable dataclasses."""

from __future__ import annotations


class AttrDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value
