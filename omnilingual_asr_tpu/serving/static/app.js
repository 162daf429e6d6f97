// OmniScribe TPU web client — from-scratch implementation of the core
// transcript workflows: upload with SSE progress, history, rendering with
// speaker/language/emotion badges, playback word-sync, inline editing
// (PUT /api/history/{id}), and exports via the server-side exporters.
"use strict";

const $ = (sel) => document.querySelector(sel);

// ------------------------------------------------------------------ auth
// JWT shell: token kept in localStorage and injected as a Bearer header on
// every /api fetch; a 401 pops the login/register overlay. Servers running
// without --auth never return 401, so the overlay stays hidden.

const TOKEN_KEY = "omniasr_token";
const _fetch = window.fetch.bind(window);
window.fetch = (url, opts = {}) => {
  const token = localStorage.getItem(TOKEN_KEY);
  if (token && String(url).startsWith("/api")) {
    opts.headers = { ...(opts.headers || {}),
                     Authorization: `Bearer ${token}` };
  }
  return _fetch(url, opts).then((resp) => {
    if (resp.status === 401 && String(url).startsWith("/api") &&
        !String(url).includes("/api/auth/")) {
      showAuth();
    }
    return resp;
  });
};

let registerMode = false;

function showAuth() {
  $("#auth-overlay").hidden = false;
}

function setAuthMode(reg) {
  registerMode = reg;
  $("#auth-title").textContent = reg ? "Create account" : "Sign in";
  $("#auth-submit").textContent = reg ? "Register" : "Sign in";
  $("#auth-code").hidden = !reg;
  $("#auth-toggle").textContent = reg
    ? "Have an account? Sign in" : "Need an account? Register";
}

document.addEventListener("DOMContentLoaded", () => {
  $("#auth-toggle").onclick = (e) => {
    e.preventDefault();
    setAuthMode(!registerMode);
  };
  $("#auth-form").onsubmit = async (e) => {
    e.preventDefault();
    const body = {
      email: $("#auth-email").value.trim(),
      password: $("#auth-password").value,
    };
    if (registerMode) body.access_code = $("#auth-code").value.trim();
    const url = registerMode ? "/api/auth/register" : "/api/auth/login";
    const resp = await _fetch(url, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body),
    });
    const out = await resp.json();
    if (resp.ok && out.token) {
      localStorage.setItem(TOKEN_KEY, out.token);
      $("#auth-overlay").hidden = true;
      refreshHistory();
    } else {
      $("#auth-error").textContent = out.error || "Failed.";
    }
  };
});

// Okabe-Ito colorblind-safe palette for speaker/language coloring.
const PALETTE = ["#0072B2", "#E69F00", "#009E73", "#CC79A7",
                 "#56B4E9", "#D55E00", "#F0E442", "#999999"];

let activeId = null;
let activeData = null;
let wordEls = [];

// ---------------------------------------------------------------- history

async function refreshHistory() {
  const items = await (await fetch("/api/history")).json();
  const ul = $("#history");
  ul.innerHTML = "";
  for (const item of items) {
    const li = document.createElement("li");
    li.textContent = item.file_name;
    li.title = item.created_at;
    li.className = item.id === activeId ? "active" : "";
    li.onclick = () => openEntry(item.id);
    const del = document.createElement("button");
    del.textContent = "×";
    del.className = "del";
    del.onclick = async (e) => {
      e.stopPropagation();
      await fetch(`/api/history/${item.id}`, { method: "DELETE" });
      if (item.id === activeId) { activeId = null; showEmpty(); }
      refreshHistory();
    };
    li.appendChild(del);
    ul.appendChild(li);
  }
}

async function openEntry(id) {
  const resp = await fetch(`/api/history/${id}`);
  if (!resp.ok) return;
  activeId = id;
  activeData = await resp.json();
  render();
  refreshHistory();
}

// ---------------------------------------------------------------- upload

function setProgress(text, frac) {
  $("#progress").hidden = false;
  $("#progress-label").textContent = text;
  $("#progress-fill").style.width = `${Math.round(frac * 100)}%`;
  if (frac >= 1) setTimeout(() => { $("#progress").hidden = true; }, 800);
}

async function uploadFiles(files) {
  const form = new FormData();
  const batch = files.length > 1 ||
    files[0].name.toLowerCase().endsWith(".zip");
  for (const f of files) form.append(batch ? "files" : "file", f);
  const lang = $("#opt-language").value.trim();
  const spk = $("#opt-speakers").value.trim();
  if (lang) form.append("language", lang);
  if (spk) form.append("speaker_count", spk);
  // single files use the live route (incremental 'segments' events);
  // batches use the reference batch SSE route
  const endpoint = batch ? "/api/transcribe-batch-stream"
                         : "/api/transcribe-stream-live";
  let resp = await fetch(endpoint, { method: "POST", body: form });
  if (resp.status === 501 && !batch) {
    resp = await fetch("/api/transcribe-stream", { method: "POST", body: form });
  }
  if (!resp.ok) { setProgress("Upload failed", 1); return; }
  let liveSegments = [];

  // Manual SSE reader, split-frame safe.
  const reader = resp.body.getReader();
  const decoder = new TextDecoder();
  let buf = "";
  let lastEntry = null;
  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += decoder.decode(value, { stream: true });
    let idx;
    while ((idx = buf.indexOf("\n\n")) >= 0) {
      const frame = buf.slice(0, idx);
      buf = buf.slice(idx + 2);
      let event = "", data = "";
      for (const line of frame.split("\n")) {
        if (line.startsWith("event: ")) event = line.slice(7);
        else if (line.startsWith("data: ")) data += line.slice(6);
      }
      if (!event) continue;
      const payload = JSON.parse(data);
      if (event === "progress") {
        const steps = ["uploading", "transcribing", "processing", "done"];
        const i = steps.indexOf(payload.step);
        const prefix = payload.file_count
          ? `[${(payload.file_index ?? 0) + 1}/${payload.file_count}] ` : "";
        setProgress(`${prefix}${payload.file_name}: ${payload.step}`,
                    (i + 1) / steps.length);
      } else if (event === "segments") {
        // incremental transcript: render as batches finish
        liveSegments = liveSegments.concat(payload.segments);
        activeId = null;
        activeData = { file_name: files[0].name, segments: liveSegments };
        render();
      } else if (event === "result") {
        lastEntry = payload.results ? payload.results[0] : payload;
      } else if (event === "error") {
        setProgress(`Error: ${payload.error}`, 1);
      }
    }
  }
  await refreshHistory();
  if (lastEntry && lastEntry.id) openEntry(lastEntry.id);
}

// ---------------------------------------------------------------- render

function showEmpty() {
  $("#viewer").hidden = true;
  $("#empty-state").hidden = false;
}

function colorFor(key, map) {
  if (!(key in map)) map[key] = PALETTE[Object.keys(map).length % PALETTE.length];
  return map[key];
}

function fmtTime(s) {
  const m = Math.floor(s / 60);
  return `${m}:${String(Math.floor(s % 60)).padStart(2, "0")}`;
}

function render() {
  $("#empty-state").hidden = true;
  $("#viewer").hidden = false;
  $("#file-name").textContent = activeData.file_name || "transcript";
  $("#summary").textContent = activeData.summary || "";

  const badges = $("#badges");
  badges.innerHTML = "";
  const speakers = [...new Set((activeData.segments || []).map(s => s.speaker))];
  const langs = activeData.detected_languages || [];
  const emotions = [...new Set((activeData.segments || [])
    .map(s => s.emotion).filter(Boolean))];
  for (const sp of speakers) addBadge(badges, sp, "spk");
  for (const l of langs) addBadge(badges, `${l.language} (${l.code})`, "lang");
  for (const e of emotions) addBadge(badges, e, "emo");

  const audio = $("#audio");
  if (activeData.audio_url) {
    audio.src = activeData.audio_url;
    audio.hidden = false;
  } else {
    audio.hidden = true;
  }

  renderTranscript();
  drawWaveform();
}

function addBadge(parent, text, cls) {
  const b = document.createElement("span");
  b.className = `badge ${cls}`;
  b.textContent = text;
  parent.appendChild(b);
}

function highlightKey(seg) {
  const mode = $("#highlight-mode").value;
  if (mode === "speaker") return seg.speaker;
  if (mode === "language") return seg.language_code || seg.language || "?";
  if (mode === "emotion") return seg.emotion || "neutral";
  return null;
}

// Code-switching color: average the colors of all languages in the segment
// (the reference's averaging approach for multi-language segments).
function mixColors(hexes) {
  let r = 0, g = 0, b = 0;
  for (const h of hexes) {
    r += parseInt(h.slice(1, 3), 16);
    g += parseInt(h.slice(3, 5), 16);
    b += parseInt(h.slice(5, 7), 16);
  }
  const n = hexes.length || 1;
  const c = (v) => Math.round(v / n).toString(16).padStart(2, "0");
  return `#${c(r)}${c(g)}${c(b)}`;
}

function segmentColor(seg, colorMap) {
  const mode = $("#highlight-mode").value;
  if (mode === "language" && seg.languages && seg.languages.length > 1) {
    return mixColors(seg.languages.map((l) => colorFor(l.code, colorMap)));
  }
  const key = highlightKey(seg);
  return key === null ? "#3a4048" : colorFor(key, colorMap);
}

let boxView = false;

function renderTranscript() {
  const root = $("#transcript");
  root.innerHTML = "";
  wordEls = [];
  const spkColors = {};
  root.classList.toggle("box-view", boxView);
  (activeData.segments || []).forEach((seg, si) => {
    const div = document.createElement("div");
    div.className = "segment";
    div.style.borderLeftColor = segmentColor(seg, spkColors);
    div.oncontextmenu = (e) => {
      e.preventDefault();
      openCtxMenu(e, si);
    };

    const head = document.createElement("div");
    head.className = "seg-head";
    head.innerHTML =
      `<span class="time">${fmtTime(seg.start)}–${fmtTime(seg.end)}</span>` +
      `<span class="speaker">${seg.speaker}</span>` +
      (seg.language_code ? `<span class="tag">${seg.language_code}</span>` : "") +
      (seg.emotion && seg.emotion !== "neutral"
        ? `<span class="tag emo">${seg.emotion}</span>` : "");
    head.querySelector(".time").onclick = (e) => {
      if (e.altKey) editTimestamps(si); else seek(seg.start);
    };
    head.querySelector(".time").title = "click: seek · alt-click: edit times";
    // click speaker name -> rename across all segments (reference
    // renameSpeaker workflow)
    head.querySelector(".speaker").onclick = () => renameSpeaker(seg.speaker);
    div.appendChild(head);

    const body = document.createElement("div");
    body.className = "seg-text";
    if (seg.words && seg.words.length) {
      for (const w of seg.words) {
        const el = document.createElement("span");
        el.className = "word";
        el.textContent = w.word + " ";
        el.dataset.start = w.start;
        el.dataset.end = w.end;
        el.onclick = () => seek(w.start);
        body.appendChild(el);
        wordEls.push(el);
      }
    } else {
      body.textContent = seg.text;
    }
    body.ondblclick = () => editSegment(si, body);
    div.appendChild(body);

    if (seg.translation && seg.translation !== "null") {
      const tr = document.createElement("div");
      tr.className = "translation";
      tr.textContent = `→ ${seg.translation}`;
      div.appendChild(tr);
    }
    root.appendChild(div);
  });
}

// inline editing -> PUT /api/history/{id} (same contract as the reference
// editor's saveActiveData)
function editSegment(si, body) {
  const seg = activeData.segments[si];
  const input = document.createElement("textarea");
  input.value = seg.text;
  input.className = "edit-box";
  body.replaceWith(input);
  input.focus();
  showIpaPicker(input);
  const save = async () => {
    seg.text = input.value;
    if (seg.words) delete seg.words;  // word alignment invalidated by edit
    await fetch(`/api/history/${activeId}`, {
      method: "PUT",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ segments: activeData.segments }),
    });
    renderTranscript();
  };
  input.onblur = save;
  input.onkeydown = (e) => {
    if (e.key === "Enter" && !e.shiftKey) { e.preventDefault(); input.blur(); }
    if (e.key === "Escape") { input.onblur = null; renderTranscript(); }
  };
}

async function saveSegments() {
  await fetch(`/api/history/${activeId}`, {
    method: "PUT",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ segments: activeData.segments }),
  });
}

async function renameSpeaker(oldName) {
  const name = prompt(`Rename "${oldName}" to:`, oldName);
  if (!name || name === oldName) return;
  for (const seg of activeData.segments) {
    if (seg.speaker === oldName) seg.speaker = name;
  }
  await saveSegments();
  render();
}

// timestamp editor: click the time range with alt/option to adjust
async function editTimestamps(si) {
  const seg = activeData.segments[si];
  const raw = prompt("Edit timestamps (start-end seconds):",
                     `${seg.start.toFixed(2)}-${seg.end.toFixed(2)}`);
  if (!raw) return;
  const m = raw.match(/^\s*([\d.]+)\s*[-–]\s*([\d.]+)\s*$/);
  if (!m) return;
  const start = parseFloat(m[1]), end = parseFloat(m[2]);
  if (!(end > start)) return;
  seg.start = start;
  seg.end = end;
  await saveSegments();
  render();
}

// IPA character picker (reference index.html:493): inserts into the
// active inline editor
const IPA_CHARS = [
  "ɐ","ɑ","ɒ","æ","ə","ɛ","ɜ","ɪ","ɨ","ɔ","ø","ɵ","œ","ʉ","ʊ","ʌ","ː",
  "ˈ","ˌ","ʔ","ʕ","β","ç","ð","ɸ","ɣ","ɥ","ɧ","ʝ","ɫ","ɬ","ɭ","ʟ","ɱ",
  "ŋ","ɲ","ɳ","ɾ","ʀ","ʁ","ɹ","ɻ","ʃ","ʂ","θ","ʈ","ʋ","ʍ","χ","ʎ","ʒ",
  "ʐ","ʑ","ʘ","ǀ","ǁ","ǂ","ǃ","ɓ","ɗ","ɠ","ʛ","ẽ","ã","õ","ĩ","ũ","̃",
];

function showIpaPicker(target) {
  let panel = $("#ipa-panel");
  if (!panel) {
    panel = document.createElement("div");
    panel.id = "ipa-panel";
    for (const ch of IPA_CHARS) {
      const b = document.createElement("button");
      b.type = "button";
      b.textContent = ch;
      b.onmousedown = (e) => {
        e.preventDefault();  // keep the textarea focused
        const start = target.selectionStart;
        target.value = target.value.slice(0, start) + ch +
          target.value.slice(target.selectionEnd);
        target.selectionStart = target.selectionEnd = start + ch.length;
      };
      panel.appendChild(b);
    }
    document.body.appendChild(panel);
  }
  const r = target.getBoundingClientRect();
  panel.style.left = `${r.left + window.scrollX}px`;
  panel.style.top = `${r.bottom + window.scrollY + 4}px`;
  panel.hidden = false;
  const hide = () => { panel.hidden = true; };
  target.addEventListener("blur", () => setTimeout(hide, 200),
                          { once: true });
}

// context menu: emotion / rename / delete (reference ctx-menu workflow)
let ctxSegIndex = null;

function openCtxMenu(e, si) {
  ctxSegIndex = si;
  const menu = $("#ctx-menu");
  menu.hidden = false;
  menu.style.left = `${e.pageX}px`;
  menu.style.top = `${e.pageY}px`;
}

document.addEventListener("click", () => { $("#ctx-menu").hidden = true; });
document.querySelectorAll("#ctx-menu button").forEach((btn) => {
  btn.onclick = async () => {
    $("#ctx-menu").hidden = true;
    if (ctxSegIndex === null) return;
    const seg = activeData.segments[ctxSegIndex];
    const act = btn.dataset.act;
    if (act === "rename") {
      await renameSpeaker(seg.speaker);
      return;
    }
    if (act === "emotion") {
      const emo = prompt("Emotion (happy/sad/angry/neutral):",
                         seg.emotion || "neutral");
      if (!emo || !["happy", "sad", "angry", "neutral"].includes(emo)) return;
      seg.emotion = emo;
    } else if (act === "delete") {
      activeData.segments.splice(ctxSegIndex, 1);
    }
    await saveSegments();
    render();
  };
});

$("#highlight-mode").onchange = () => renderTranscript();
$("#view-toggle").onclick = () => {
  boxView = !boxView;
  $("#view-toggle").textContent = boxView ? "Flow view" : "Box view";
  renderTranscript();
};

// ---------------------------------------------------------------- playback

function seek(t) {
  const audio = $("#audio");
  if (!audio.hidden) { audio.currentTime = t; audio.play(); }
}

setInterval(() => {
  const audio = $("#audio");
  if (audio.hidden || audio.paused) return;
  const t = audio.currentTime;
  for (const el of wordEls) {
    const on = t >= +el.dataset.start && t < +el.dataset.end;
    el.classList.toggle("playing", on);
  }
}, 100);

// ---------------------------------------------------------------- waveform

async function drawWaveform() {
  const canvas = $("#waveform");
  const ctx = canvas.getContext("2d");
  canvas.width = canvas.clientWidth * devicePixelRatio;
  ctx.clearRect(0, 0, canvas.width, canvas.height);
  if (!activeData.audio_url) return;
  try {
    const buf = await (await fetch(activeData.audio_url)).arrayBuffer();
    const actx = new (window.AudioContext || window.webkitAudioContext)();
    const decoded = await actx.decodeAudioData(buf);
    const data = decoded.getChannelData(0);
    const W = canvas.width, H = canvas.height;
    const per = Math.max(1, Math.floor(data.length / W));
    ctx.fillStyle = "#4a90d9";
    for (let x = 0; x < W; x++) {
      let lo = 0, hi = 0;
      for (let i = x * per; i < (x + 1) * per && i < data.length; i++) {
        if (data[i] < lo) lo = data[i];
        if (data[i] > hi) hi = data[i];
      }
      const mid = H / 2;
      ctx.fillRect(x, mid + lo * mid, 1, Math.max(1, (hi - lo) * mid));
    }
    canvas.onclick = (e) => {
      const frac = e.offsetX / canvas.clientWidth;
      seek(frac * decoded.duration);
    };
    actx.close();
  } catch { /* audio unavailable: skip waveform */ }
}

// ------------------------------------------------------------- spectrogram
// Client-side log spectrogram for visual inspection (the production mel
// frontend runs on-device via the Pallas kernel; this is display-only).

let showSpectrogram = false;

$("#viz-toggle").onclick = () => {
  showSpectrogram = !showSpectrogram;
  $("#viz-toggle").textContent = showSpectrogram ? "Waveform" : "Spectrogram";
  $("#waveform").hidden = showSpectrogram;
  $("#spectrogram").hidden = !showSpectrogram;
  if (showSpectrogram) drawSpectrogram();
};

function fftRadix2(re, im) {
  // iterative in-place Cooley-Tukey
  const n = re.length;
  for (let i = 1, j = 0; i < n; i++) {
    let bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      [re[i], re[j]] = [re[j], re[i]];
      [im[i], im[j]] = [im[j], im[i]];
    }
  }
  for (let len = 2; len <= n; len <<= 1) {
    const ang = -2 * Math.PI / len;
    const wr = Math.cos(ang), wi = Math.sin(ang);
    for (let i = 0; i < n; i += len) {
      let cr = 1, ci = 0;
      for (let k = 0; k < len / 2; k++) {
        const ur = re[i + k], ui = im[i + k];
        const vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        const vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr; im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr; im[i + k + len / 2] = ui - vi;
        const ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr; cr = ncr;
      }
    }
  }
}

function heatColor(v) {
  // 0..1 -> dark blue -> cyan -> yellow
  const r = Math.min(255, Math.max(0, Math.round(510 * (v - 0.5))));
  const g = Math.min(255, Math.max(0, Math.round(v < 0.5 ? 510 * v : 255)));
  const b = Math.min(255, Math.max(0, Math.round(v < 0.5 ? 100 + 310 * v : 255 * (1.5 - v))));
  return [r, g, b];
}

async function drawSpectrogram() {
  const canvas = $("#spectrogram");
  const ctx = canvas.getContext("2d");
  canvas.width = canvas.clientWidth * devicePixelRatio;
  if (!activeData.audio_url) return;
  try {
    const buf = await (await fetch(activeData.audio_url)).arrayBuffer();
    const actx = new (window.AudioContext || window.webkitAudioContext)();
    const decoded = await actx.decodeAudioData(buf);
    const data = decoded.getChannelData(0);
    actx.close();
    const W = canvas.width, H = canvas.height;
    const NFFT = 512;
    const hop = Math.max(NFFT / 2, Math.floor(data.length / W));
    const win = new Float32Array(NFFT);
    for (let i = 0; i < NFFT; i++) {
      win[i] = 0.5 - 0.5 * Math.cos(2 * Math.PI * i / NFFT);
    }
    const img = ctx.createImageData(W, H);
    const cols = Math.min(W, Math.floor((data.length - NFFT) / hop));
    const DYN = 70; // dB dynamic range
    for (let x = 0; x < cols; x++) {
      const re = new Float32Array(NFFT), im = new Float32Array(NFFT);
      const off = x * hop;
      for (let i = 0; i < NFFT; i++) re[i] = (data[off + i] || 0) * win[i];
      fftRadix2(re, im);
      for (let y = 0; y < H; y++) {
        const bin = Math.floor((1 - y / H) * (NFFT / 2));
        const p = re[bin] * re[bin] + im[bin] * im[bin];
        const db = 10 * Math.log10(p + 1e-12);
        const v = Math.min(1, Math.max(0, (db + DYN) / DYN));
        const [r, g, b] = heatColor(v);
        const idx = (y * W + x) * 4;
        img.data[idx] = r; img.data[idx + 1] = g; img.data[idx + 2] = b;
        img.data[idx + 3] = 255;
      }
    }
    ctx.putImageData(img, 0, 0);

    // Formant overlay (F1-F3): smoothed-spectrum peak picking per column
    // in 200-4000 Hz, Okabe-Ito colors.
    const sr = decoded.sampleRate;
    const binHz = sr / NFFT;
    const loBin = Math.max(1, Math.floor(200 / binHz));
    const hiBin = Math.min(NFFT / 2 - 2, Math.ceil(4000 / binHz));
    const F_COLORS = ["#E69F00", "#56B4E9", "#009E73"];
    for (let x = 0; x < cols; x += 2) {
      const re = new Float32Array(NFFT), im = new Float32Array(NFFT);
      const off = x * hop;
      let energy = 0;
      for (let i = 0; i < NFFT; i++) {
        re[i] = (data[off + i] || 0) * win[i];
        energy += re[i] * re[i];
      }
      if (energy < 1e-4) continue; // silence: no formants
      fftRadix2(re, im);
      const mag = new Float32Array(hiBin + 2);
      for (let b_ = loBin - 1; b_ <= hiBin + 1; b_++) {
        mag[b_] = Math.sqrt(re[b_] * re[b_] + im[b_] * im[b_]);
      }
      // 5-bin moving average smoothing, then local maxima
      const peaks = [];
      for (let b_ = loBin + 2; b_ <= hiBin - 2 && peaks.length < 3; b_++) {
        const sm = (bb) => (mag[bb - 1] + mag[bb] + mag[bb + 1]) / 3;
        if (sm(b_) > sm(b_ - 1) && sm(b_) > sm(b_ + 1) &&
            sm(b_) > 0.05 * Math.max(...mag)) {
          peaks.push(b_);
          b_ += 2; // skip adjacent bins of the same peak
        }
      }
      peaks.forEach((bin, fi) => {
        const y = Math.round((1 - bin / (NFFT / 2)) * H);
        ctx.fillStyle = F_COLORS[fi];
        ctx.fillRect(x, y, 2, 2);
      });
    }

    // Intensity curve: per-column RMS in dB drawn over the spectrogram.
    ctx.strokeStyle = "rgba(255,255,255,0.85)";
    ctx.lineWidth = 1.5;
    ctx.beginPath();
    let started = false;
    for (let x = 0; x < cols; x++) {
      const off = x * hop;
      let sum = 0;
      for (let i = 0; i < NFFT; i++) {
        const s = data[off + i] || 0;
        sum += s * s;
      }
      const db = 10 * Math.log10(sum / NFFT + 1e-12);
      const v = Math.min(1, Math.max(0, (db + DYN) / DYN));
      const y = H - 4 - v * (H - 8);
      if (started) ctx.lineTo(x, y); else { ctx.moveTo(x, y); started = true; }
    }
    ctx.stroke();

    canvas.onclick = (e) => {
      seek((e.offsetX / canvas.clientWidth) * decoded.duration);
    };
  } catch { /* display-only; ignore decode errors */ }
}

// ---------------------------------------------------------------- exports

document.querySelectorAll("#export-row button").forEach((btn) => {
  btn.onclick = async () => {
    if (!activeId) return;
    const fmt = btn.dataset.fmt;
    const resp = await fetch(`/api/history/${activeId}/export?format=${fmt}`);
    const blob = await resp.blob();
    const a = document.createElement("a");
    a.href = URL.createObjectURL(blob);
    const base = (activeData.file_name || "transcript").replace(/\.[^/.]+$/, "");
    const ext = { textgrid: "TextGrid" }[fmt] || fmt;
    a.download = `${base}.${ext}`;
    a.click();
    URL.revokeObjectURL(a.href);
  };
});

// ---------------------------------------------------------------- wiring

$("#file-input").onchange = (e) => {
  if (e.target.files.length) uploadFiles([...e.target.files]);
};
const dz = $("#drop-zone");
dz.ondragover = (e) => { e.preventDefault(); dz.classList.add("drag"); };
dz.ondragleave = () => dz.classList.remove("drag");
dz.ondrop = (e) => {
  e.preventDefault();
  dz.classList.remove("drag");
  if (e.dataTransfer.files.length) uploadFiles([...e.dataTransfer.files]);
};

// search overlay: filter segments by text
const searchBox = document.createElement("input");
searchBox.id = "search-box";
searchBox.placeholder = "Search transcript (press /)";
$("#viz-controls").appendChild(searchBox);
searchBox.oninput = () => {
  const q = searchBox.value.toLowerCase();
  document.querySelectorAll(".segment").forEach((el) => {
    el.style.display = !q || el.textContent.toLowerCase().includes(q)
      ? "" : "none";
  });
};

// playback speed menu (reference speed menu 0.25-2x)
const speedSel = document.createElement("select");
speedSel.id = "speed-select";
for (const s of [0.25, 0.5, 0.75, 1, 1.25, 1.5, 2]) {
  const o = document.createElement("option");
  o.value = s;
  o.textContent = `${s}×`;
  if (s === 1) o.selected = true;
  speedSel.appendChild(o);
}
$("#viz-controls").appendChild(speedSel);
speedSel.onchange = () => { $("#audio").playbackRate = +speedSel.value; };

// keyboard shortcuts (space play/pause, arrows +-5s, / focuses search)
document.addEventListener("keydown", (e) => {
  if (e.target.tagName === "INPUT" || e.target.tagName === "TEXTAREA") return;
  const audio = $("#audio");
  if (e.key === " ") {
    e.preventDefault();
    if (audio.paused) audio.play(); else audio.pause();
  } else if (e.key === "ArrowLeft") {
    audio.currentTime = Math.max(0, audio.currentTime - 5);
  } else if (e.key === "ArrowRight") {
    audio.currentTime += 5;
  } else if (e.key === "/") {
    e.preventDefault();
    searchBox.focus();
  }
});

async function boot() {
  await refreshHistory();
  // first visit with empty history: show the built-in demo transcript
  if (!$("#history").children.length) {
    try {
      const demo = await (await fetch("/api/demo")).json();
      if (demo && demo.segments) {
        activeId = "demo";
        activeData = demo;
        render();
      }
    } catch { /* demo optional */ }
  }
}

boot();
