from .tail import stream_changelog_to_table

__all__ = ["stream_changelog_to_table"]
