"""JournalFilter — metadata post-filter DSL.

Parity target: reference Filters/JournalFilter.swift:12 — a builder DSL
(dateBetween / includingTags / excludingTags / allowMissingKeys / and) that
compiles to a `@Sendable ([String:String]?) -> Bool` predicate applied after
candidate generation (JournalFilter.swift:74-124).

Host-side by design: metadata lives on the host; search pipelines oversample
on device, then apply the compiled predicate to the candidate list (the same
post-filter placement as the reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Callable, Optional

Metadata = Optional[dict]
Predicate = Callable[[Metadata], bool]


def _parse_date(value) -> Optional[date]:
    if isinstance(value, datetime):
        return value.date()
    if isinstance(value, date):
        return value
    if isinstance(value, str):
        try:
            return datetime.fromisoformat(value).date()
        except ValueError:
            return None
    return None


@dataclass
class JournalFilter:
    """Builder DSL mirroring JournalFilter.swift:32-69. All clauses AND
    together; `compile()` produces the predicate."""

    date_key: str = "date"
    tags_key: str = "tags"
    tags_delimiter: str = ","  # reference tagsDelimiter (JournalFilter.swift:16)
    allow_missing_keys: bool = False
    require_all_included_tags: bool = False  # reference default: ANY-of (:18)
    _date_lo: Optional[date] = None
    _date_hi: Optional[date] = None
    _include_tags: set = field(default_factory=set)
    _exclude_tags: set = field(default_factory=set)
    _extra: list = field(default_factory=list)

    def date_between(self, lo, hi) -> "JournalFilter":
        self._date_lo = _parse_date(lo)
        self._date_hi = _parse_date(hi)
        return self

    def set_keys(
        self, date_key=None, tags_key=None, delimiter=None
    ) -> "JournalFilter":
        """Reference setKeys(dateKey:tagsKey:delimiter:) (JournalFilter.swift:38)."""
        if date_key is not None:
            self.date_key = date_key
        if tags_key is not None:
            self.tags_key = tags_key
        if delimiter is not None:
            self.tags_delimiter = delimiter
        return self

    def including_tags(self, *tags: str, require_all: bool = False) -> "JournalFilter":
        """Tags whitespace-trimmed, empties dropped; require_all toggles
        all-of vs any-of (reference includingTags, JournalFilter.swift:47)."""
        self._include_tags.update(t.strip() for t in tags if t.strip())
        self.require_all_included_tags = require_all
        return self

    def excluding_tags(self, *tags: str) -> "JournalFilter":
        self._exclude_tags.update(t.strip() for t in tags if t.strip())
        return self

    def allowing_missing_keys(self, allow: bool = True) -> "JournalFilter":
        self.allow_missing_keys = allow
        return self

    def and_(self, predicate: Predicate) -> "JournalFilter":
        """Custom clause (reference `.and`, JournalFilter.swift:69)."""
        self._extra.append(predicate)
        return self

    def _tags_of(self, meta: dict, key: str) -> Optional[set]:
        raw = meta.get(key)
        if raw is None:
            return None
        if isinstance(raw, str):
            return {
                t.strip() for t in raw.split(self.tags_delimiter) if t.strip()
            }
        return set(raw)

    def compile(self) -> Predicate:
        date_lo, date_hi = self._date_lo, self._date_hi
        include, exclude = frozenset(self._include_tags), frozenset(self._exclude_tags)
        extra = tuple(self._extra)
        allow_missing = self.allow_missing_keys
        require_all = self.require_all_included_tags
        date_key, tags_key = self.date_key, self.tags_key

        def predicate(meta: Metadata) -> bool:
            if meta is None:
                # nil metadata == every key missing: passes iff missing keys
                # are allowed, or no key-dependent clause exists
                if allow_missing:
                    return all(p(None) for p in extra) if extra else True
                return not include and date_lo is None and date_hi is None
            if date_lo is not None or date_hi is not None:
                d = _parse_date(meta.get(date_key))
                if d is None:
                    if not allow_missing:
                        return False
                else:
                    if date_lo is not None and d < date_lo:
                        return False
                    if date_hi is not None and d > date_hi:
                        return False
            if include or exclude:
                tags = self._tags_of(meta, tags_key)
                if tags is None:
                    # missing tags key: pass built-in tag checks iff allowed
                    # (reference build(), JournalFilter.swift:104)
                    if not allow_missing:
                        return False
                else:
                    if include:
                        if require_all:
                            if not include.issubset(tags):
                                return False
                        elif include.isdisjoint(tags):
                            return False
                    if exclude and tags & exclude:
                        return False
            return all(p(meta) for p in extra)

        return predicate
