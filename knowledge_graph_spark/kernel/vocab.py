# -*- coding: utf-8 -*-
"""Controlled vocabularies of the knowledge-graph extraction kernel.

These ARE the semantics of the reference extractor and are reproduced
verbatim (values, not code) from the reference's public repo:

- ENTITY_MAPPING   — reference /root/reference/backend/kgapi/extractor.py:13-29
- VERB_RELATION_MAP — extractor.py:31-38
- STOP_VERBS       — extractor.py:40
- ORG/PRODUCT/TITLE rule patterns — extractor.py:44-60

Everything else in this module (tokenizer lexicons, location/surname
pools, function-word classes) is original: the sandbox ships no spaCy
model, so the statistical tokenizer/tagger/NER is replaced by a
deterministic rule kernel with the same downstream contract
(see kernel/extractor.py).
"""

# spaCy NER label -> canonical entity type (extractor.py:13-29).
# Unknown labels pass through unchanged (extractor.py:89).
ENTITY_MAPPING = {
    "PERSON": "Person",
    "ORG": "Organization",
    "GPE": "Location",
    "NORP": "Group",
    "WORK_OF_ART": "Work",
    "DATE": "DATE",
    "MONEY": "MONEY",
    "TIME": "TIME",
    "PERCENT": "PERCENT",
    "CARDINAL": "Number",
    "LAW": "Law",
    "PRODUCT": "Product",
    "EVENT": "Event",
    "FAC": "Facility",
    "TITLE": "Title",
}

# Chinese surface verb -> canonical English predicate (extractor.py:31-38).
# Unmapped verbs fall through as the raw surface form (extractor.py:109).
VERB_RELATION_MAP = {
    "创立": "found", "创建": "found", "成立": "found",
    "收购": "acquire", "并购": "acquire", "投资": "invest",
    "开发": "develop", "担任": "serve_as", "合作": "cooperate",
    "达成": "reach", "发表": "publish", "宣布": "announce",
    "任命": "appoint", "加入": "join", "提升": "promote",
    "降低": "reduce", "获得": "win", "战胜": "defeat", "支持": "support",
}

# Copula/light verbs that never yield relations (extractor.py:40).
STOP_VERBS = {"是", "有", "在", "为", "没有", "包括", "包含",
              "成为", "等等", "表示", "认为", "强调"}

# Rule-based entity pattern vocab (extractor.py:44-60).
ORG_SUFFIXES = ("公司", "集团", "企业", "中心", "研究院",
                "银行", "大学", "学院", "医院", "实验室")
PRODUCT_PREFIXES = ("智能", "新型")
PRODUCT_SUFFIXES_SMART = ("系统", "平台", "设备", "工具", "软件", "应用")
PRODUCT_SUFFIXES_NEW = ("技术", "产品", "药物", "方法")
TITLE_FIRST = ("首席", "总裁", "副总裁", "总经理", "副总经理",
               "主席", "副主席", "主任", "副主任")
TITLE_SECOND = ("执行官", "科学家", "工程师", "教授", "医生", "律师", "分析师")

# ----------------------------------------------------------------------
# Original tokenizer/tagger lexicons (no counterpart in the reference —
# they stand in for the spaCy zh model's statistical components).
# ----------------------------------------------------------------------

# Verbs the rule tagger recognises: the controlled verbs plus common
# news verbs so real-world prose still parses sensibly.
EXTRA_VERBS = {
    "签订", "建立", "建设", "推出", "发布", "收获", "举办",
    "参与", "启动", "完成", "实现", "推动", "指导", "展开", "围绕",
    "加速", "重塑", "集成", "指出", "注入", "专注", "上线", "聚焦",
}
ALL_VERBS = set(VERB_RELATION_MAP) | set(STOP_VERBS) | EXTRA_VERBS

# Prepositions (ADP). 在/为 double as STOP_VERBS in the reference; we
# tag them ADP which is relation-equivalent (stop verbs never emit).
ADPOSITIONS = {"与", "和", "在", "于", "向", "对", "为", "同", "跟", "基于", "根据", "按照"}

# One-char function words that also commonly open real org names
# (同德集团, 和信科技公司 — auspicious morphemes 同/和). In non-nominal
# left context (sentence start, after punctuation/verb/particle) the
# tokenizer lets an org-suffix run starting AT the function char win;
# between two nominals (华星科技和蓝海集团, 沈刚与秦岚) the
# conjunction/preposition reading keeps priority. Deliberately NOT all
# one-char ADPs: 在/为/对 open grammatical PPs far more often than
# names (在深圳大学… must stay PP + org, so 在 never gets the override).
NAME_INITIAL_FUNCTION_CHARS = frozenset({"和", "同"})

# Adverbs / auxiliaries that sit between subject and verb.
ADVERBS = {"将", "也", "则", "正式", "共同", "正", "已", "已经", "预计",
           "日前", "近日", "此次", "此外", "随后", "同时", "仍", "不断"}

# Particles / determiners / conjunctions (never nouns, never verbs).
PARTICLES = {"的", "地", "得", "了", "着", "过", "等", "之", "所"}
DETERMINERS = {"该", "这", "那", "其", "本", "此", "一个", "一家", "一种", "双方"}
CONJUNCTIONS = {"并", "且", "而", "或", "及", "以及", "但", "不仅", "而且"}

# Common nouns the tokenizer should keep whole (improves segmentation
# of real prose; synthetic corpus also draws fillers from here).
COMMON_NOUNS = {
    "协议", "合作协议", "战略合作协议", "项目", "技术", "领域", "行业",
    "专家", "格局", "事件", "里程碑", "顾问", "技术顾问", "先生", "女士",
    "博士", "教授", "校长", "董事会", "董事长", "客服", "模型", "大语言模型",
    "自然语言处理", "计算机视觉", "人工智能", "生成式AI", "多模态", "交互",
    "研究", "应用", "金融", "医疗", "教育", "产业", "科技", "研究生",
    "芯片", "原型", "设计", "能力", "动能", "制程", "工艺", "晶圆",
    "测试", "自动化", "骨干", "导师", "产学研", "工程", "方案", "市场", "研发",
    "数据", "平台", "报告", "成果", "奖项", "冠军", "比赛", "团队",
}

# Location gazetteer (stands in for the model's GPE recognition).
LOCATIONS = {
    "北京", "上海", "深圳", "广州", "杭州", "南京", "成都", "武汉",
    "合肥", "天津", "重庆", "苏州", "西安", "青岛", "中国", "美国",
    "欧洲", "亚洲", "日本", "德国", "法国", "英国", "香港", "澳门",
}

# Chinese surname pool for the rule PERSON recogniser.
SURNAMES = set(
    "李王张刘陈杨赵黄周吴徐孙胡朱高林何郭马罗梁宋郑谢韩唐冯于董萧程曹袁邓许傅沈曾彭吕苏卢蒋蔡贾丁魏薛叶阎余潘杜戴夏钟汪田任姜范方石姚谭廖邹熊金陆郝孔白崔康毛邱秦江史顾侯邵孟龙万段雷钱汤尹黎易常武乔贺赖龚文"
)

# Honorific/name-following cues for the PERSON rule.
PERSON_CUES = ("先生", "女士", "博士", "教授", "校长", "院士")

# Sentence-final punctuation.
SENT_END = set("。！？；!?;\n")

# All punctuation the tokenizer treats as hard boundaries.
PUNCT = set("。，、；：！？!?,;:“”\"'‘’「」『』（）()《》<>【】[]—…·-~～　")
