from . import video_play_etl

__all__ = ["video_play_etl"]
