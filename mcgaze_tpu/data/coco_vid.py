"""COCO-VID (YouTubeVIS-style) annotation index.

Replaces the reference's MPEblink API (mmdet/datasets/mpeblink_api.py:42-130)
with a minimal dict-based index:

json layout:
  videos:      [{id, width, height, length, file_names: [...]}]
  annotations: [{id, video_id, category_id, bboxes: [xywh|None per frame],
                 gaze: [[x,y,z]|[yaw,pitch]|None per frame], ...}]
  categories:  [{id, name}]
"""
from __future__ import annotations

import json
from collections import defaultdict


class CocoVid:
    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            self.dataset = json.load(f)
        self.vids = {v['id']: v for v in self.dataset.get('videos', [])}
        self.anns = {a['id']: a for a in self.dataset.get('annotations', [])}
        self.cats = {c['id']: c for c in self.dataset.get('categories', [])}
        self.vid_to_anns = defaultdict(list)
        for a in self.dataset.get('annotations', []):
            self.vid_to_anns[a['video_id']].append(a)
        for v in self.vid_to_anns.values():
            v.sort(key=lambda a: a['id'])

    def get_vid_ids(self):
        return sorted(self.vids)

    def get_cat_ids(self):
        return sorted(self.cats)

    def load_vid(self, vid_id: int) -> dict:
        return self.vids[vid_id]

    def anns_of_video(self, vid_id: int) -> list:
        """Per-instance annotation tracks of a video, ordered by ann id
        (face, eyes, head instance order relies on this, matching the
        reference's getAnnIds ordering consumed by gaze_fixed_assigner)."""
        return self.vid_to_anns[vid_id]
