"""Data tools: VOC XML -> YOLO txt conversion and the label visualizer
(reference: yolov6/data/voc2yolo.py, yolov6/data/vis_dataset.py)."""

import os.path as osp

import cv2
import numpy as np

from yolov6_tpu.data.vis_dataset import visualize
from yolov6_tpu.data.voc2yolo import VOC_NAMES, convert_box, convert_label

XML = """<annotation>
  <size><width>200</width><height>100</height><depth>3</depth></size>
  <object>
    <name>dog</name><difficult>0</difficult>
    <bndbox><xmin>20</xmin><ymin>10</ymin><xmax>120</xmax><ymax>60</ymax></bndbox>
  </object>
  <object>
    <name>person</name><difficult>1</difficult>
    <bndbox><xmin>0</xmin><ymin>0</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
  <object>
    <name>not_a_voc_class</name><difficult>0</difficult>
    <bndbox><xmin>0</xmin><ymin>0</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>
"""


def test_convert_box_center_norm():
    # reference formula (voc2yolo.py convert_box): half-open center minus 1px
    x, y, w, h = convert_box((200, 100), [20.0, 120.0, 10.0, 60.0])
    assert abs(x - (70 - 1) / 200) < 1e-9
    assert abs(y - (35 - 1) / 100) < 1e-9
    assert abs(w - 100 / 200) < 1e-9
    assert abs(h - 50 / 100) < 1e-9


def test_convert_label_skips_difficult_and_unknown(tmp_path):
    xml = tmp_path / "a.xml"
    xml.write_text(XML)
    out = tmp_path / "a.txt"
    convert_label(str(xml), str(out))
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 1  # difficult person + unknown class dropped
    vals = rows[0].split()
    assert int(vals[0]) == VOC_NAMES.index("dog")
    assert all(0.0 <= float(v) <= 1.0 for v in vals[1:])


def test_visualize_draws_boxes(tmp_path):
    img_dir, lb_dir, out_dir = tmp_path / "im", tmp_path / "lb", tmp_path / "out"
    img_dir.mkdir(), lb_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((100, 200, 3), np.uint8))
    (lb_dir / "a.txt").write_text("3 0.5 0.5 0.4 0.6\n")
    cv2.imwrite(str(img_dir / "b.jpg"), np.zeros((50, 50, 3), np.uint8))
    # b has no label file -> image still copied through

    visualize(str(img_dir), str(lb_dir), str(out_dir), class_names=VOC_NAMES)

    a = cv2.imread(str(out_dir / "a.jpg"))
    assert a is not None and a.sum() > 0  # rectangle + label drawn on black
    assert osp.exists(out_dir / "b.jpg")
