from .node import Node
from .parser import parse_fragment, parse_html
from .serializer import serialize

__all__ = ["Node", "parse_html", "parse_fragment", "serialize"]
