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
  const endpoint = batch ? "/api/transcribe-batch-stream"
                         : "/api/transcribe-stream";
  const resp = await fetch(endpoint, { method: "POST", body: form });
  if (!resp.ok) { setProgress("Upload failed", 1); return; }

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

function renderTranscript() {
  const root = $("#transcript");
  root.innerHTML = "";
  wordEls = [];
  const spkColors = {};
  (activeData.segments || []).forEach((seg, si) => {
    const div = document.createElement("div");
    div.className = "segment";
    div.style.borderLeftColor = colorFor(seg.speaker, spkColors);

    const head = document.createElement("div");
    head.className = "seg-head";
    head.innerHTML =
      `<span class="time">${fmtTime(seg.start)}–${fmtTime(seg.end)}</span>` +
      `<span class="speaker">${seg.speaker}</span>` +
      (seg.language_code ? `<span class="tag">${seg.language_code}</span>` : "") +
      (seg.emotion && seg.emotion !== "neutral"
        ? `<span class="tag emo">${seg.emotion}</span>` : "");
    head.querySelector(".time").onclick = () => seek(seg.start);
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

refreshHistory();
