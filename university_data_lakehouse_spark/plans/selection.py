"""Asset-selection mini-DSL.

Reference parity: ``scheduled_job_component.py:62-113``
(_parse_asset_selection): ``group:name``, ``tag:key=value``,
``tag:key``, ``kind:name``, ``key:a/b``, ``*``, unions with ``|``,
intersections with ``&`` (| binds looser than &, as in the
reference's recursive split order). A bare token selects a group.
"""

from __future__ import annotations

from collections.abc import Iterable

from .assets import Asset


def _match_atom(asset: Asset, atom: str) -> bool:
    atom = atom.strip()
    if atom == "*":
        return True
    if atom.startswith("group:"):
        return asset.group == atom[len("group:"):]
    if atom.startswith("tag:"):
        expr = atom[len("tag:"):]
        if "=" in expr:
            k, v = expr.split("=", 1)
            return asset.tags.get(k) == v
        return expr in asset.tags
    if atom.startswith("kind:"):
        return asset.kind == atom[len("kind:"):]
    if atom.startswith("key:"):
        return asset.key == atom[len("key:"):]
    return asset.group == atom


def _matches(asset: Asset, expr: str) -> bool:
    # '|' binds looser than '&' — mirror of the reference's split order
    if "|" in expr:
        return any(_matches(asset, p) for p in expr.split("|"))
    if "&" in expr:
        return all(_matches(asset, p) for p in expr.split("&"))
    return _match_atom(asset, expr)


def select_assets(assets: Iterable[Asset], selection: str) -> list[str]:
    return sorted(a.key for a in assets if _matches(a, selection))
