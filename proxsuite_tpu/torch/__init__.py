from .qplayer import QPFunction

__all__ = ["QPFunction"]
