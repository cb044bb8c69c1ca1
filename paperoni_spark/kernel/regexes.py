"""Readability heuristic regexes.

Pattern-for-pattern port of /root/reference/src/moz_readability/regexes.rs
(which itself derives from Mozilla Readability's public heuristics).  The Rust
``regex`` crate syntax used there is a compatible subset of Python ``re``
(no lookaround is used; inline ``(?i)`` works identically), so the patterns
are carried over verbatim.  Compiled once at module import — the Python-side
analogue of ``lazy_static!`` compile-once-per-process.
"""

from __future__ import annotations

import re

_BYLINE = re.compile(r"(?i)byline|author|dateline|writtenby|p-author")
_POSITIVE = re.compile(
    r"(?i)article|body|content|entry|hentry|h-entry|main|page|pagination|post|text|blog|story"
)
_NEGATIVE = re.compile(
    r"(?i)hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|foot|footer|footnote"
    r"|gdpr|masthead|media|meta|outbrain|promo|related|scroll|share|shoutbox|sidebar|skyscraper"
    r"|sponsor|shopping|tags|tool|widget"
)
_VIDEOS = re.compile(
    r"(?i)//(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq)\.com"
    r"|(archive|upload\.wikimedia)\.org|player\.twitch\.tv)"
)
_UNLIKELY = re.compile(
    r"(?i)-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|extra"
    r"|footer|gdpr|header|legends|menu|related|remark|replies|rss|shoutbox|sidebar|skyscraper"
    r"|social|sponsor|supplemental|ad-break|agegate|pagination|pager|popup|yom-remote"
)
_OK_MAYBE = re.compile(r"(?i)and|article|body|column|content|main|shadow")
_NODE_CONTENT = re.compile(r"\.( |$)")
_SHARE_ELEMS = re.compile(r"(?i)(\b|_)(share|sharedaddy)(\b|_)")
_HAS_CONTENT = re.compile(r"\S$")
_IMG_EXT = re.compile(r"(?i)\.(jpg|jpeg|png|webp)")
_SRCSET = re.compile(r"\.(jpg|jpeg|png|webp)\s+\d")
_SRC = re.compile(r"^\s*\S+\.(jpg|jpeg|png|webp)\S*\s*$")
_NAME_PATTERN = re.compile(
    r"(?i)\s*(?:(dc|dcterm|og|twitter|weibo:(article|webpage))\s*[\.:]\s*)?"
    r"(author|creator|description|title|site_name)\s*$"
)
_TITLE_SEPARATOR = re.compile(r" [\|\-\\/>»] ")
_HAS_TITLE_SEPARATOR = re.compile(r" [\\/>»] ")

NORMALIZE_REGEX = re.compile(r"\s{2,}")
B64_DATA_URL_REGEX = re.compile(r"(?i)^data:\s*([^\s;,]+)\s*;\s*base64\s*")
BASE64_REGEX = re.compile(r"(?i)base64\s*")
PROPERTY_REGEX = re.compile(
    r"(?i)\s*(dc|dcterm|og|twitter)\s*:\s*(author|creator|description|title|site_name)\s*"
)
SRCSET_CAPTURE_REGEX = re.compile(r"(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))")
REPLACE_WHITESPACE_REGEX = re.compile(r"\s")
REPLACE_DOT_REGEX = re.compile(r"\.")
REPLACE_HTML_ESCAPE_REGEX = re.compile("&(quot|amp|apos|lt|gt);")
REPLACE_HEX_REGEX = re.compile(r"(?i)&#(?:x([0-9a-z]{1,4})|([0-9]{1,4}));")
REPLACE_START_SEPARATOR_REGEX = re.compile(r"(?i)(?P<start>.*)[\|\-\\/>»] .*")
REPLACE_END_SEPARATOR_REGEX = re.compile(r"(?i)[^\|\-\\/>»]*[\|\-\\/>»](?P<end>.*)")
REPLACE_MULTI_SEPARATOR_REGEX = re.compile(r"[\|\-\\/>»]+")


def is_match_byline(s: str) -> bool:
    return _BYLINE.search(s) is not None


def is_match_positive(s: str) -> bool:
    return _POSITIVE.search(s) is not None


def is_match_negative(s: str) -> bool:
    return _NEGATIVE.search(s) is not None


def is_match_videos(s: str) -> bool:
    return _VIDEOS.search(s) is not None


def is_match_unlikely(s: str) -> bool:
    return _UNLIKELY.search(s) is not None


def is_match_ok_maybe(s: str) -> bool:
    return _OK_MAYBE.search(s) is not None


def is_match_node_content(s: str) -> bool:
    return _NODE_CONTENT.search(s) is not None


def is_match_share_elems(s: str) -> bool:
    return _SHARE_ELEMS.search(s) is not None


def is_match_has_content(s: str) -> bool:
    return _HAS_CONTENT.search(s) is not None


def is_match_img_ext(s: str) -> bool:
    return _IMG_EXT.search(s) is not None


def is_match_srcset(s: str) -> bool:
    return _SRCSET.search(s) is not None


def is_match_src_regex(s: str) -> bool:
    return _SRC.search(s) is not None


def is_match_name_pattern(s: str) -> bool:
    return _NAME_PATTERN.search(s) is not None


def is_match_title_separator(s: str) -> bool:
    return _TITLE_SEPARATOR.search(s) is not None


def is_match_has_title_separator(s: str) -> bool:
    return _HAS_TITLE_SEPARATOR.search(s) is not None
