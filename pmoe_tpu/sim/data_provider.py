"""Per-tick cached world-state provider — the CarlaDataProvider analog.

The scenario runtime's CarlaDataProvider (reference srunner/scenariomanager/
carla_data_provider.py:32-808) is a static registry that caches every actor's
velocity/location/transform once per tick so criteria and behaviors don't
repeat TCP RPCs against the CARLA server. This is the same seam for our
bridge: every ``get_*`` within one frame hits the cache; ``on_tick``
invalidates. It also carries the actor registry, spawn-point table, and the
ego-route storage the scenario machinery shares.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

__all__ = ["WorldStateProvider"]


class WorldStateProvider:
    def __init__(self):
        self._actors: Dict[int, Any] = {}
        self._roles: Dict[str, int] = {}
        self._frame: int = -1
        self._loc_cache: Dict[int, Tuple[float, float, float]] = {}
        self._vel_cache: Dict[int, Tuple[float, float, float]] = {}
        self._tf_cache: Dict[int, Any] = {}
        self._spawn_points: List = []
        self._ego_route = None

    # -- registry -------------------------------------------------------------
    def register_actor(self, actor: Any, role: Optional[str] = None) -> None:
        self._actors[actor.id] = actor
        if role:
            self._roles[role] = actor.id

    def unregister_actor(self, actor: Any) -> None:
        self._actors.pop(getattr(actor, "id", actor), None)

    def get_actor_by_role(self, role: str) -> Optional[Any]:
        aid = self._roles.get(role)
        return self._actors.get(aid) if aid is not None else None

    def actors(self) -> List[Any]:
        return list(self._actors.values())

    def clear(self) -> None:
        self._actors.clear()
        self._roles.clear()
        self.on_tick(-1)

    # -- per-tick cache ---------------------------------------------------------
    def on_tick(self, frame: int) -> None:
        """Invalidate the state caches; call once per world tick (the
        reference updates its dictionaries in on_carla_tick)."""
        self._frame = frame
        self._loc_cache.clear()
        self._vel_cache.clear()
        self._tf_cache.clear()

    def get_location(self, actor: Any):
        aid = actor.id
        if aid not in self._loc_cache:
            self._loc_cache[aid] = actor.get_location()
        return self._loc_cache[aid]

    def get_velocity(self, actor: Any):
        aid = actor.id
        if aid not in self._vel_cache:
            self._vel_cache[aid] = actor.get_velocity()
        return self._vel_cache[aid]

    def get_transform(self, actor: Any):
        aid = actor.id
        if aid not in self._tf_cache:
            self._tf_cache[aid] = actor.get_transform()
        return self._tf_cache[aid]

    # -- shared scenario state ---------------------------------------------------
    def set_spawn_points(self, points) -> None:
        self._spawn_points = list(points)

    def spawn_points(self):
        return list(self._spawn_points)

    def set_ego_route(self, route) -> None:
        self._ego_route = route

    def get_ego_route(self):
        return self._ego_route
