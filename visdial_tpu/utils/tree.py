"""Pytree path utilities shared by checkpointing and sharding rules.

Both subsystems key off the same path-string format (e.g. 'embed/table',
'decoder/out_proj/w'), so the formatter lives in exactly one place.
"""

from __future__ import annotations


def tree_path_str(path) -> str:
    """jax.tree_util key path -> 'a/b/0/c' string."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)
