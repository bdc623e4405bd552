from .connector import FileSystemConnector

__all__ = ["FileSystemConnector"]
