from . import channel_report, video_play_etl

__all__ = ["channel_report", "video_play_etl"]
