"""Text-normalization corpus: the reference's own TN cases (front.py:444-489)
plus breadth cases (ordinals, fractions, ranges, phone numbers, measures).

The reference delegates zh/en TN to WeTextProcessing/tn; our normalizer is a
pure-Python rule set, so expected strings are this framework's goldens — they
encode the same *reading* the reference stack produces for each case (pinyin
protection, name protection, contraction expansion are reference-exact;
number expansion readings follow standard zh/en TTS conventions)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from indextts_tpu.frontend.normalize import TextNormalizer  # noqa: E402

CASES = [
    # --- reference corpus (front.py:444-489) ---
    ("IndexTTS 正式发布1.0版本了，效果666",
     "IndexTTS 正式发布一点零版本了,效果六百六十六"),
    ("晕XUAN4是一种GAN3觉", "晕XVAN4是一种GAN3觉"),
    ("我爱你！", "我爱你!"),
    ("I love you!", "I love you!"),
    ("“我爱你”的英语是“I love you”", "'我爱你'的英语是'I love you'"),
    ("2.5平方电线", "二点五平方电线"),
    ("共465篇，约315万字", "共四百六十五篇,约三百一十五万字"),
    ("2002年的第一场雪，下在了2003年", "二零零二年的第一场雪,下在了二零零三年"),
    ("速度是10km/h", "速度是十公里每小时"),
    ("现在是北京时间2025年01月11日 20:00", "现在是北京时间二零二五年一月十一日 二十点"),
    ("他这条裤子是2012年买的，花了200块钱", "他这条裤子是二零一二年买的,花了二百块钱"),
    ("电话：135-4567-8900", "电话,幺三五四五六七八九零零"),
    ("1键3连", "一键三连"),
    ("他这条视频点赞3000+，评论1000+，收藏500+",
     "他这条视频点赞三千多,评论一千多,收藏五百多"),
    ("这是1024元的手机，你要吗？", "这是一千零二十四元的手机,你要吗?"),
    ("受不liao3你了", "受不liao3你了"),
    ("“衣裳”不读衣chang2，而是读衣shang5", "'衣裳'不读衣chang2,而是读衣shang5"),
    ("最zhong4要的是：不要chong2蹈覆辙", "最zhong4要的是,不要chong2蹈覆辙"),
    ("不zuo1死就不会死", "不zuo1死就不会死"),
    ("See you at 8:00 AM", "See you at eight o'clock A M"),
    ("Couting down 3, 2, 1, go!", "Couting down three, two, one, go!"),
    ("数到3就开始：1、2、3", "数到三就开始,一,二,三"),
    ("This sales for 2.5% off, only $12.5.",
     "This sales for two point five percent off, only twelve point five dollars."),
    ("5G网络是4G网络的升级版，2G网络是3G网络的前身",
     "五G网络是四G网络的升级版,二G网络是三G网络的前身"),
    ("苹果于2030/1/2发布新 iPhone 2X 系列手机，最低售价仅 ¥12999",
     "苹果于二零三零年一月二日发布新 iPhone 二X 系列手机,最低售价仅 一万二千九百九十九元"),
    ("这酒...里...有毒...", "这酒…里…有毒…"),
    ("只有,,,才是最好的", "只有…才是最好的"),
    ("babala2是什么？", "babala二是什么?"),
    ("用beta1测试", "用beta一测试"),
    ("have you ever been to beta2?", "have you ever been to beta two?"),
    ("such as XTTS, CosyVoice2, Fish-Speech, and F5-TTS",
     "such as XTTS, CosyVoice two, Fish-Speech, and F five-TTS"),
    ("where's the money?", "where is the money?"),
    ("who's there?", "who is there?"),
    ("which's the best?", "which is the best?"),
    ("how's it going?", "how is it going?"),
    ("今天是个好日子 it's a good day", "今天是个好日子 it is a good day"),
    # names survive normalization intact (placeholder save/restore)
    ("约瑟夫·高登-莱维特（Joseph Gordon-Levitt is an American actor）",
     "约瑟夫-高登-莱维特'Joseph Gordon-Levitt is an American actor'"),
    # --- breadth: ordinals ---
    ("排名第3位", "排名第三位"),
    ("他考了第21名", "他考了第二十一名"),
    ("the 3rd place and the 21st floor", "the third place and the twenty-first floor"),
    ("the 12th and the 40th", "the twelfth and the fortieth"),
    # --- breadth: fractions ---
    ("3/4的人同意", "四分之三的人同意"),
    ("a 1/2 cup and 3/4 of it", "a one half cup and three quarters of it"),
    ("2/3 done", "two thirds done"),
    # --- breadth: ranges + negatives ---
    ("今天气温-3~5度", "今天气温负三到五度"),
    ("距离3-5公里", "距离三到五公里"),
    ("pages 3-5", "pages three to five"),
    ("it is -5 degrees", "it is minus five degrees"),
    # --- breadth: phone numbers ---
    ("call 135-456-7890 now",
     "call one three five, four five six, seven eight nine zero now"),
    ("手机号13812345678", "手机号幺三八幺二三四五六七八"),
    # --- breadth: measures ---
    ("体重65kg，身高175cm", "体重六十五千克,身高一百七十五厘米"),
    ("水温30℃", "水温三十摄氏度"),
    ("it weighs 2.5kg and runs at 3GHz",
     "it weighs two point five kilograms and runs at three gigahertz"),
    ("1km/h is slow", "one kilometer per hour is slow"),
    ("download 100MB in 5s", "download one hundred megabytes in five s"),
]


@pytest.fixture(scope="module")
def tn():
    return TextNormalizer().load()


@pytest.mark.parametrize("text,want", CASES, ids=[c[0][:24] for c in CASES])
def test_corpus(tn, text, want):
    assert tn.normalize(text) == want


def test_long_mixed_passages_digit_free(tn):
    """The reference's long passages: everything must come out digit-free with
    CJK content and protected names preserved."""
    passages = [
        "《盗梦空间》是由美国华纳兄弟影片公司出品的电影，由克里斯托弗·诺兰执导并编剧，"
        "2010年7月16日在美国上映，2010年9月1日在中国内地上映，2020年8月28日在中国内地重映。",
        "设计师秘密：内置微型重力感应器，随步伐产生0.01mm振幅，打造“行走的星光”。"
        "钛合金骨架仅3.2g无负重感。",
        "电影1：“黑暗骑士”（演员：克里斯蒂安·贝尔、希斯·莱杰；导演：克里斯托弗·诺兰）；"
        "电影2：“盗梦空间”（演员：莱昂纳多·迪卡普里奥；导演：克里斯托弗·诺兰）",
    ]
    for p in passages:
        out = tn.normalize(p)
        assert not any(ch.isdigit() for ch in out), out
        if "克里斯托弗" in p:
            assert "克里斯托弗-诺兰" in out


def test_use_chinese_routing(tn):
    assert tn.use_chinese("你好")
    assert tn.use_chinese("hao3 de5")          # pinyin tones route zh
    assert tn.use_chinese("someone@example.com")
    assert not tn.use_chinese("plain english")
