from .autonomous_agent import AutonomousAgent, Track
from .waypointer import Waypointer
from .image_agent import ImageAgent, get_entry_point

__all__ = ["AutonomousAgent", "Track", "Waypointer", "ImageAgent",
           "get_entry_point"]
