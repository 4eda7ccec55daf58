from . import aggregate, enrich, sessionize, setops, timegrid

__all__ = ["aggregate", "enrich", "sessionize", "setops", "timegrid"]
